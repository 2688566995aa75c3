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


def mesh_from_spec(spec: str) -> Mesh:
    """Parse the CLI ``--mesh`` string ``DPxTP`` (e.g. ``2x4``).

    Bare ``N`` means ``Nx1``. The ONE place the mesh CLI syntax lives —
    cli/{infer,serve,train}.py all parse through here.
    """
    dp, _, tp = spec.partition("x")
    return make_mesh(int(dp), int(tp or 1))


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


def opt_specs(opt_state: Any, params: Any, n_data: int) -> Any:
    """ZeRO-1 spec tree for an optax state: moments shard over ``data``.

    Optimizer moments (AdamW mu/nu) are param-shaped and never enter the
    forward/backward — only the tiny elementwise update reads them — so
    replicating them across the ``data`` axis wastes 2 × params of HBM
    per chip (3.4 GB at Base f32). Every param-structured subtree inside
    the optax state gets its param's TP spec plus ``data`` on the first
    free axis whose dim divides ``n_data`` (GSPMD turns the update into
    a reduce-scatter + all-gather pair over ICI — the ZeRO-1 trade);
    scalars (step counts) and unshardable leaves stay replicated. The
    reference has no analogue (DDP replicates optimizer state,
    /root/reference/src/training/trainer.py:76-80).
    """
    p_treedef = jax.tree_util.tree_structure(params)
    pspecs = param_specs(params)

    def moment_spec(leaf: Any, spec: P) -> P:
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if n_data <= 1 or not shape:
            return spec
        parts = list(spec) + [None] * (len(shape) - len(spec))
        if "data" in parts:
            return spec
        for i, p in enumerate(parts):
            if p is None and shape[i] % n_data == 0 and shape[i] >= n_data:
                parts[i] = "data"
                break
        return P(*parts)

    def is_param_tree(node: Any) -> bool:
        try:
            return jax.tree_util.tree_structure(node) == p_treedef
        except Exception:
            return False

    def assign(node: Any) -> Any:
        if is_param_tree(node):
            return jax.tree_util.tree_map(moment_spec, node, pspecs)
        return jax.tree_util.tree_map(lambda _: P(), node)

    return jax.tree_util.tree_map(assign, opt_state, is_leaf=is_param_tree)


def opt_shardings(mesh: Mesh, opt_state: Any, params: Any) -> Any:
    n_data = int(mesh.shape.get("data", 1))
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        opt_specs(opt_state, params, n_data),
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
