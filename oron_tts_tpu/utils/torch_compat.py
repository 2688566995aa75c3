"""Conversion between reference PyTorch checkpoints and flax param pytrees.

Layout rules:
- torch Linear weight [out, in]  → flax Dense kernel [in, out] (transpose)
- torch Conv1d weight [out, in/g, k] → flax Conv kernel [k, in/g, out]
- torch Embedding / LayerNorm / GRN params keep their shapes

Key map follows reference /root/reference/src/models/dit.py and modules.py.
Accepts torch tensors or numpy arrays; torch is only needed to read ``.pt``
files, never for compute.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_ORIG_MOD = "._orig_mod."


def _np(value: Any) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def _linear(sd: Mapping[str, Any], key: str) -> dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _conv1d(sd: Mapping[str, Any], key: str) -> dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{key}.weight"]).transpose(2, 1, 0),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _layernorm(sd: Mapping[str, Any], key: str) -> dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def strip_compiled_prefix(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Normalize torch.compile's `._orig_mod.` key decoration away.

    A TOP-LEVEL compiled module prefixes keys with a leading "_orig_mod."
    (no dot before it), which the mid-key replace alone would miss."""
    return {
        k.removeprefix("_orig_mod.").replace(_ORIG_MOD, "."): v
        for k, v in state_dict.items()
    }


def strip_prefix(state_dict: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in state_dict.items() if k.startswith(prefix)}


def _convnext_block(sd: Mapping[str, Any], key: str) -> dict[str, Any]:
    return {
        "dwconv": _conv1d(sd, f"{key}.dwconv"),
        "norm": _layernorm(sd, f"{key}.norm"),
        "pwconv1": _linear(sd, f"{key}.pwconv1"),
        "grn": {
            "gamma": _np(sd[f"{key}.grn.gamma"]),
            "beta": _np(sd[f"{key}.grn.beta"]),
        },
        "pwconv2": _linear(sd, f"{key}.pwconv2"),
    }


def convert_dit_state_dict(
    state_dict: Mapping[str, Any],
    depth: int,
    conv_layers: int,
) -> dict[str, Any]:
    """Reference torch DiT state_dict → flax params for models.dit.DiT."""
    sd = strip_compiled_prefix(state_dict)

    text_embed: dict[str, Any] = {
        "embed": {"embedding": _np(sd["text_embed.text_embed.weight"])}
    }
    for i in range(conv_layers):
        text_embed[f"block{i}"] = _convnext_block(sd, f"text_embed.text_blocks.{i}")

    params: dict[str, Any] = {
        "time_embed": {
            "mlp_in": _linear(sd, "time_embed.time_mlp.0"),
            "mlp_out": _linear(sd, "time_embed.time_mlp.2"),
        },
        "text_embed": text_embed,
        "input_embed": {
            "proj": _linear(sd, "input_embed.proj"),
            "conv_pos_embed": {
                "conv1": _conv1d(sd, "input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv1d(sd, "input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "norm_out": {"linear": _linear(sd, "norm_out.linear")},
        "proj_out": _linear(sd, "proj_out"),
    }
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        params[f"block{i}"] = {
            "attn_norm": {"linear": _linear(sd, f"{b}.attn_norm.linear")},
            "attn": {
                "to_q": _linear(sd, f"{b}.attn.to_q"),
                "to_k": _linear(sd, f"{b}.attn.to_k"),
                "to_v": _linear(sd, f"{b}.attn.to_v"),
                "to_out": _linear(sd, f"{b}.attn.to_out.0"),
            },
            "ff": {
                "in_proj": _linear(sd, f"{b}.ff.ff.0"),
                "out_proj": _linear(sd, f"{b}.ff.ff.3"),
            },
        }
    return params


def convert_f5tts_state_dict(
    state_dict: Mapping[str, Any],
    depth: int,
    conv_layers: int,
) -> dict[str, Any]:
    """Reference F5TTS (cfm.backbone.*) state_dict → flax DiT params."""
    sd = strip_compiled_prefix(state_dict)
    backbone = strip_prefix(sd, "cfm.backbone.")
    if not backbone:  # maybe already backbone-level keys
        backbone = sd
    return convert_dit_state_dict(backbone, depth=depth, conv_layers=conv_layers)


def merge_compatible(
    params: dict[str, Any], loaded: dict[str, Any]
) -> tuple[dict[str, Any], list[str]]:
    """Overlay ``loaded`` onto ``params``, skipping shape-mismatched leaves.

    The reference's non-strict pretrained load (checkpoint.py:153-205): lets
    an official F5-TTS Base checkpoint load while the 65-token Cyrillic text
    embedding keeps its fresh initialization.

    Returns (merged, skipped_paths).
    """
    import jax

    skipped: list[str] = []

    def keystr(kp) -> str:
        return "/".join(k.key if hasattr(k, "key") else str(k) for k in kp)

    flat_loaded = {
        keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }

    def pick(kp, base_leaf):
        path = keystr(kp)
        cand = flat_loaded.get(path)
        if cand is None:
            skipped.append(path + " (missing)")
            return base_leaf
        if np.shape(cand) != np.shape(base_leaf):
            skipped.append(path)
            return base_leaf
        return np.asarray(cand, dtype=np.asarray(base_leaf).dtype)

    merged = jax.tree_util.tree_map_with_path(pick, params)
    return merged, skipped


def load_torch_checkpoint(path: str, prefer_ema: bool = True,
                          weights_only: bool = False) -> dict[str, Any]:
    """Read a reference ``.pt``/``.safetensors`` checkpoint into numpy arrays.

    Prefers EMA weights like reference scripts/infer.py:20-24; pass
    ``prefer_ema=False`` for the raw training weights (--no-ema).
    ``weights_only=True`` restricts the pickle to tensor payloads — use it
    for any file fetched over the network (a full .pt training checkpoint
    from a LOCAL trusted run needs the default, its optimizer/scheduler
    state is not weights-only loadable).
    """
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=weights_only)
    if isinstance(ckpt, dict):
        keys = ("ema_state_dict", "ema_model_state_dict", "model_state_dict")
        if not prefer_ema:
            keys = ("model_state_dict", "ema_state_dict", "ema_model_state_dict")
        for key in keys:
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return {k: _np(v) for k, v in ckpt.items()}


# ── reverse direction: flax params → reference torch state dict ─────────


def _t_linear(sd: dict[str, np.ndarray], key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = np.asarray(p["kernel"]).T
    sd[f"{key}.bias"] = np.asarray(p["bias"])


def _t_conv1d(sd: dict[str, np.ndarray], key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(2, 1, 0)
    sd[f"{key}.bias"] = np.asarray(p["bias"])


def _t_layernorm(sd: dict[str, np.ndarray], key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = np.asarray(p["scale"])
    sd[f"{key}.bias"] = np.asarray(p["bias"])


def _t_convnext(sd: dict[str, np.ndarray], key: str, p: Mapping[str, Any]) -> None:
    _t_conv1d(sd, f"{key}.dwconv", p["dwconv"])
    _t_layernorm(sd, f"{key}.norm", p["norm"])
    _t_linear(sd, f"{key}.pwconv1", p["pwconv1"])
    sd[f"{key}.grn.gamma"] = np.asarray(p["grn"]["gamma"])
    sd[f"{key}.grn.beta"] = np.asarray(p["grn"]["beta"])
    _t_linear(sd, f"{key}.pwconv2", p["pwconv2"])


def export_dit_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """flax DiT params → reference torch DiT state_dict (numpy values).

    Exact inverse of convert_dit_state_dict: checkpoints trained here load
    into the PyTorch reference (strict=True modulo RoPE's inv_freq buffer,
    which torch re-derives from config).
    """
    if "blocks" in params:
        # scan_blocks models hold one stacked [depth, ...] subtree; the
        # torch contract is per-block keys, so unstack first
        import jax

        from oron_tts_tpu.models.dit import unstack_block_params

        leaves = jax.tree_util.tree_leaves(params["blocks"])
        params = unstack_block_params(dict(params), int(leaves[0].shape[0]))

    sd: dict[str, np.ndarray] = {}
    _t_linear(sd, "time_embed.time_mlp.0", params["time_embed"]["mlp_in"])
    _t_linear(sd, "time_embed.time_mlp.2", params["time_embed"]["mlp_out"])

    te = params["text_embed"]
    sd["text_embed.text_embed.weight"] = np.asarray(te["embed"]["embedding"])
    conv_layers = sum(1 for k in te if k.startswith("block"))
    for i in range(conv_layers):
        _t_convnext(sd, f"text_embed.text_blocks.{i}", te[f"block{i}"])

    _t_linear(sd, "input_embed.proj", params["input_embed"]["proj"])
    cpe = params["input_embed"]["conv_pos_embed"]
    _t_conv1d(sd, "input_embed.conv_pos_embed.conv1d.0", cpe["conv1"])
    _t_conv1d(sd, "input_embed.conv_pos_embed.conv1d.2", cpe["conv2"])

    depth = sum(1 for k in params if k.startswith("block"))
    for i in range(depth):
        blk = params[f"block{i}"]
        base = f"transformer_blocks.{i}"
        _t_linear(sd, f"{base}.attn_norm.linear", blk["attn_norm"]["linear"])
        for proj in ("q", "k", "v"):
            _t_linear(sd, f"{base}.attn.to_{proj}", blk["attn"][f"to_{proj}"])
        _t_linear(sd, f"{base}.attn.to_out.0", blk["attn"]["to_out"])
        _t_linear(sd, f"{base}.ff.ff.0", blk["ff"]["in_proj"])
        _t_linear(sd, f"{base}.ff.ff.3", blk["ff"]["out_proj"])

    _t_linear(sd, "norm_out.linear", params["norm_out"]["linear"])
    _t_linear(sd, "proj_out", params["proj_out"])
    return sd


def export_f5tts_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """flax DiT params → reference F5TTS-level keys (cfm.backbone.*)."""
    return {
        f"cfm.backbone.{k}": v for k, v in export_dit_state_dict(params).items()
    }


def save_safetensors(state_dict: Mapping[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file(
        {k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path
    )
