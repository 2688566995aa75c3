"""HBM budgeting: the auto-remat decision must see collator-padded shapes.

utils/memory.py worst_case_padded_frames models what a frame-budget batch
really compiles at after the collator rounds rows to a multiple of 8 (× the
data-mesh size) and T to 64 — the raw frame budget underestimates by
1.4-8x and picking no-remat from it OOMs (the calibration's own failure
mode)."""

from oron_tts_tpu.utils.memory import (
    auto_gradient_checkpointing,
    estimate_train_hbm_bytes,
    worst_case_padded_frames,
)


def test_worst_case_exceeds_raw_budget():
    # runpod config: 48k budget, 30 s clips (2813 frames), rows x8, T x64:
    # 17 clips of 2816 frames (47.9k true) collate to 24 x 2816 = 67,584
    w = worst_case_padded_frames(48000, 2813, row_multiple=8,
                                 t_multiple=64, max_samples=48,
                                 min_clip_frames=94)
    assert w == 24 * 2816
    # the padded worst case is what the step compiles at — always >= budget
    assert w > 48000


def test_single_long_clip_dominates_small_budgets():
    # a lone 30 s clip still pads to 8 rows: 8 x 2816 = 22,528 even when
    # the budget is only 3000 frames
    w = worst_case_padded_frames(3000, 2813, row_multiple=8, t_multiple=64,
                                 min_clip_frames=94)
    assert w == 8 * 2816


def test_min_clip_caps_row_count():
    # without the min-clip floor the sweep would run to budget-many
    # 1-frame rows (3M+ "frames"); with 1 s clips it stays physical
    w = worst_case_padded_frames(48000, 2813, row_multiple=8, t_multiple=64,
                                 min_clip_frames=94)
    assert w < 100_000


def test_auto_remat_flips_with_frames():
    cfg = {"model": {"dim": 1024, "depth": 22}, "adam_mu_dtype": "bfloat16"}
    hbm = 15_750_000_000  # v5e-1 usable
    # calibration anchors (docs/KERNELS.md): 24,576 frames fits no-remat,
    # 32,768 frames measured-OOMs — the model must flip AT the measured
    # OOM point, not merely somewhere above it
    assert auto_gradient_checkpointing(cfg, 24_576, hbm_bytes=hbm) is False
    assert auto_gradient_checkpointing(cfg, 32_768, hbm_bytes=hbm) is True


def test_estimate_monotonic():
    a = estimate_train_hbm_bytes(428_000_000, 24_576, 1024, 22)
    b = estimate_train_hbm_bytes(428_000_000, 49_152, 1024, 22)
    r = estimate_train_hbm_bytes(428_000_000, 49_152, 1024, 22, remat=True)
    assert b > a > r > 0
