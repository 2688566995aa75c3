"""HBM budgeting: auto-select activation rematerialization.

``gradient_checkpointing: auto`` (config) picks no-remat whenever the
step's frame budget fits device memory — the measured fast path
(docs/KERNELS.md "Base train step": no-remat + heads-in-lanes attention +
bf16 Adam mu reached 33.9% MFU at B=12·T=2048 vs 28.6% with remat at
B=24). The model is calibrated on v5e-1 (16 GB) measurements and scales
linearly in params and frames; it is deliberately conservative — a wrong
"no-remat" answer is an OOM, a wrong "remat" answer is ~15% speed.
"""

from __future__ import annotations

from typing import Any


def dit_param_count(dim: int, depth: int, text_dim: int = 512,
                    mel_dim: int = 100, ff_mult: int = 4,
                    vocab_size: int = 65, conv_layers: int = 4) -> int:
    """Approximate DiT parameter count from config dims (Base ≈ 428M)."""
    per_block = (4 + 2 * ff_mult + 6) * dim * dim  # qkvo + ffn + AdaLN
    text = vocab_size * text_dim + conv_layers * (
        7 * text_dim + 2 * 2 * text_dim * text_dim
    )
    input_embed = (2 * mel_dim + text_dim) * dim + 2 * dim * dim // 16 * 31
    final = dim * mel_dim + 2 * dim * dim + 256 * dim + dim * dim  # + time MLP
    return depth * per_block + text + input_embed + final


# Calibration (v5e-1, 15.75 GB usable, Base dim=1024 depth=22, bf16,
# lanes attention, bf16 mu): B=12·T=2048 = 24,576 frames no-remat FITS
# (measured 840 ms/step); B=16·T=2048 = 32,768 frames OOMs at 17.33 GB.
# Solving 17.33 GB = state+grads (~7.7 GB) + 32,768·a gives a ≈ 295
# KB/frame ≈ 13 bytes/frame/dim/layer. The margin is tuned so the
# measured-fitting point passes (14.9 GB est vs 15.1 GB budget) and the
# measured-OOM point fails.
_ACT_BYTES_PER_FRAME_DIM_LAYER = 13.0
_HBM_MARGIN = 0.96


def estimate_train_hbm_bytes(
    n_params: int, frames: int, dim: int, depth: int,
    mu_bf16: bool = True, remat: bool = False,
) -> int:
    state = n_params * (4 + 4 + (2 if mu_bf16 else 4) + 4)  # p+ema+mu+nu
    grads = n_params * 4
    act_per_frame = _ACT_BYTES_PER_FRAME_DIM_LAYER * dim * depth
    if remat:
        act_per_frame /= depth  # only block boundaries are saved
    return int(state + grads + frames * act_per_frame)


def worst_case_padded_frames(
    frames_threshold: int,
    max_clip_frames: int,
    row_multiple: int = 1,
    t_multiple: int = 64,
    max_samples: int = 0,
    min_clip_frames: int = 1,
) -> int:
    """Largest rows×T a frame-budget batch can REALLY occupy after padding.

    The sampler bounds the sum of true frames by ``frames_threshold``, but
    the collator rounds the batch axis up to ``row_multiple`` (8 on the
    frame path, × the data-mesh size) and T up to ``t_multiple`` — e.g. 17
    clips of 2816 frames (47.9k ≤ 48k budget) collate to 24 rows × 2816 =
    67.6k frames, 1.4× the budget. Feeding the raw threshold to the remat
    chooser therefore underestimates HBM and OOMs; this sweeps the batch
    row count and returns the padded worst case (sorted packing makes rows
    within a batch similar lengths, so T ≈ threshold/(rows-1), capped by
    the longest clip).
    """
    def round_up(n: int, m: int) -> int:
        return -(-n // m) * m

    min_clip_frames = max(1, min_clip_frames)
    worst = round_up(max_clip_frames, t_multiple) * row_multiple  # r = 1
    # the sampler can't pack more rows than the budget divided by the
    # shortest admissible clip (dataset min_duration_s)
    r_cap = frames_threshold // min_clip_frames + 1
    if max_samples:
        r_cap = min(r_cap, max_samples)
    r = 2
    while r <= r_cap:
        t = min(max_clip_frames,
                max(min_clip_frames, frames_threshold // (r - 1)))
        worst = max(worst, round_up(r, row_multiple) * round_up(t, t_multiple))
        r += 1
    return worst


def auto_gradient_checkpointing(
    config: dict[str, Any], max_frames_per_chip: int,
    hbm_bytes: int | None = None,
) -> bool:
    """True = remat needed; False = the no-remat fast path fits."""
    m = config.get("model", {}) or {}
    dim = m.get("dim", 1024)
    depth = m.get("depth", 22)
    n_params = dit_param_count(
        dim, depth,
        text_dim=m.get("text_dim", 512),
        mel_dim=config.get("n_mels", 100),
        ff_mult=m.get("ff_mult", 4),
        vocab_size=m.get("vocab_size", 65),
        conv_layers=m.get("conv_layers", 4),
    )
    if hbm_bytes is None:
        hbm_bytes = device_memory_bytes()
    mu_bf16 = config.get("adam_mu_dtype", "bfloat16") == "bfloat16"
    need = estimate_train_hbm_bytes(
        n_params, max_frames_per_chip, dim, depth, mu_bf16=mu_bf16,
        remat=False,
    )
    return need > hbm_bytes * _HBM_MARGIN


def device_memory_bytes(default: int = 16 << 30) -> int:
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return default
