"""Device mesh + sharding rules (the NCCL/DDP replacement, TPU-native).

Parallelism is expressed as a 2-D ``("data", "model")`` mesh with
NamedShardings; XLA GSPMD inserts the collectives (grad psum over ICI for
data parallelism, all-gather/reduce-scatter for tensor parallelism). The
reference's single strategy was single-node DDP (train.py:48-56); here DP is
``n_model=1`` and TP shards the attention/FFN projections across ``model``.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; kernel axis layout is
# flax Dense [in, out] / Conv [k, in, out]
_PARAM_RULES: list[tuple[str, P]] = [
    # attention QKV: shard heads (output features) over "model"
    (r"attn/to_[qkv]/kernel$", P(None, "model")),
    (r"attn/to_[qkv]/bias$", P("model")),
    # attention output proj: shard the contracting axis → psum at output
    (r"attn/to_out/kernel$", P("model", None)),
    # FFN: column-parallel in, row-parallel out (Megatron layout)
    (r"ff/in_proj/kernel$", P(None, "model")),
    (r"ff/in_proj/bias$", P("model")),
    (r"ff/out_proj/kernel$", P("model", None)),
    # int8 serving (w8a8, models/layers.py QDense): kernel_q mirrors the
    # full-precision kernel; the per-OUTPUT-channel scale [N] follows the
    # kernel's N axis — sharded for column-parallel layers, replicated
    # for row-parallel ones (their N axis is unsharded)
    (r"attn/to_[qkv]/kernel_q$", P(None, "model")),
    (r"attn/to_[qkv]/scale$", P("model")),
    (r"attn/to_out/kernel_q$", P("model", None)),
    (r"ff/in_proj/kernel_q$", P(None, "model")),
    (r"ff/in_proj/scale$", P("model")),
    (r"ff/out_proj/kernel_q$", P("model", None)),
]


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list[Any] | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {n_total} devices"
        )
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def _spec_for_path(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            if path.startswith("blocks/") or "/blocks/" in path:
                # stacked scan_blocks layout: leaves carry a leading
                # [depth] axis (models/dit.py stack_block_params), so the
                # rule's axes shift right by one — depth stays unsharded
                return P(None, *spec)
            return spec
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching ``params`` (DiT naming)."""
    def assign(keypath, _leaf):
        path = "/".join(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return _spec_for_path(path)

    return jax.tree_util.tree_map_with_path(assign, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(params)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: Any) -> Any:
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch: dict[str, Any]) -> dict[str, Any]:
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        # each host holds its local slice of the global batch; assemble the
        # global array across hosts (DCN-aware path for multi-host pods)
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def shard_dataset_indices(n: int) -> list[int]:
    """Per-host sample shard (replaces DistributedSampler's rank split)."""
    return list(range(jax.process_index(), n, jax.process_count()))


def host_shard_wraparound(
    indices: list[int], num_hosts: int, host_id: int
) -> list[int]:
    """Per-host index shard padded by wrap-around to EQUAL counts.

    Uneven shards would give hosts different batch counts and deadlock the
    global-batch collectives, so the tail is padded by repeating indices
    from the front (DistributedSampler's drop_last=False analogue). Every
    index appears on exactly one host (the wrap-around duplicates aside).
    """
    if num_hosts <= 1:
        return list(indices)
    padded = list(indices)
    if len(padded) % num_hosts:
        padded = padded + padded[: num_hosts - len(padded) % num_hosts]
    return padded[host_id::num_hosts]
