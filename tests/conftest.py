"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Must set env vars before jax initializes its backends, hence module scope.
The TPU tunnel is intentionally avoided in unit tests; the bench script and
driver exercise the real chip.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment image pins JAX_PLATFORMS=axon (TPU tunnel) at a level the
# env var alone doesn't always override; pin the config explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


def add_reference_to_path() -> None:
    """Allow `import src.*` from the read-only reference for parity tests.

    The reference package __init__ files eagerly import soundfile/torchaudio
    (absent here), so we register namespace-style stand-ins for `src`,
    `src.utils`, `src.models`, `src.data` whose __path__ points into the
    reference tree without executing their __init__ side effects. Leaf
    modules (number_norm, tokenizer, dit, flow, ...) then import normally.
    """
    import types

    ref = str(REFERENCE_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    # stub native-audio deps absent from this image; parity tests only touch
    # pure-Python reference functions, so the stubs are never actually called
    for missing in ("soundfile", "librosa", "vocos", "torch_ema"):
        if missing not in sys.modules:
            try:
                __import__(missing)
            except ImportError:
                sys.modules[missing] = types.ModuleType(missing)
    if "torchaudio" not in sys.modules:
        try:
            import torchaudio  # noqa: F401
        except ImportError:
            ta = types.ModuleType("torchaudio")
            ta.functional = types.ModuleType("torchaudio.functional")
            ta.transforms = types.SimpleNamespace(MelSpectrogram=None)
            sys.modules["torchaudio"] = ta
            sys.modules["torchaudio.functional"] = ta.functional
    for name, sub in [
        ("src", ""),
        ("src.utils", "utils"),
        ("src.models", "models"),
        ("src.data", "data"),
        ("src.training", "training"),
    ]:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = [str(REFERENCE_ROOT / "src" / sub if sub else REFERENCE_ROOT / "src")]
        sys.modules[name] = mod


# ---------------------------------------------------------------------------
# Two-tier suite: "slow" marks the heavy integration tests (>=10 s on the
# 2026-08 CI baseline, measured with `pytest --durations=0`; full suite
# ~36 min, fast tier ~4 min). Run the fast tier with `-m "not slow"`;
# CI runs it per-push and the full suite nightly (.github/workflows/ci.yml,
# CONTRIBUTING.md). Regenerate after perf shifts:
#   python -m pytest tests/ -q --durations=0 | awk '$1+0>=10 {print $3}'
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "tests/test_alignment_eval.py::test_synthesize_mel_shape_and_untrained_cer",
    "tests/test_aot_cache_bypass.py::test_aot_second_shape_with_state_format_chain",
    "tests/test_cfg_interval.py::test_facade_threads_cfg_interval",
    "tests/test_cfg_interval.py::test_full_interval_identical_to_none",
    "tests/test_cfg_interval.py::test_partial_interval_matches_manual_loop",
    "tests/test_cfm_parity.py::test_train_loss_sane",
    "tests/test_convergence.py::test_loss_decreases",
    "tests/test_f5tts_facade.py::test_bf16_param_storage_matches_f32_under_bf16_compute",
    "tests/test_f5tts_facade.py::test_chunked_synthesis_matches_serial",
    "tests/test_f5tts_facade.py::test_chunked_synthesis_with_ref_matches_serial",
    "tests/test_f5tts_facade.py::test_synthesize_batch",
    "tests/test_f5tts_facade.py::test_synthesize_batch_chunks_long_texts",
    "tests/test_f5tts_facade.py::test_synthesize_batch_composition_invariant",
    "tests/test_f5tts_facade.py::test_synthesize_batch_matches_solo_with_seeds",
    "tests/test_f5tts_facade.py::test_synthesize_batch_with_ref_matches_solo",
    "tests/test_f5tts_facade.py::test_synthesize_stream_concat_equals_synthesize",
    "tests/test_flash_lanes.py::test_dit_block_lanes_matches_einsum",
    "tests/test_multichip.py::test_dp_equals_single_device_loss",
    "tests/test_multichip.py::test_dryrun_multichip_8",
    "tests/test_multichip.py::test_mesh_serving_matches_single_device",
    "tests/test_multichip.py::test_tp_matches_dp_loss",
    "tests/test_multichip.py::test_zero1_opt_sharding_matches_replicated",
    "tests/test_multihost.py::test_two_process_train_step",
    "tests/test_multihost.py::test_two_process_trainer_epoch",
    "tests/test_ode_method.py::test_facade_threads_method",
    "tests/test_ode_method.py::test_midpoint_composes_with_cfg_interval",
    "tests/test_ode_method.py::test_midpoint_converges",
    "tests/test_quantized.py::test_quantized_sampling_deviation",
    "tests/test_quantized.py::test_w8a8_mesh_serving_matches_single_device",
    "tests/test_quantized.py::test_w8a8_quantize_after_set_mesh",
    "tests/test_scan_blocks.py::test_scanned_gradients_match",
    "tests/test_serve.py::test_concurrent_requests_merge_and_match_solo",
    "tests/test_serve.py::test_prewarm_lattice_covers_live_traffic",
    "tests/test_serve.py::test_prewarm_lattice_covers_live_traffic_under_mesh",
    "tests/test_serve.py::test_stream_endpoint_matches_synthesize",
    "tests/test_t_mods_hoist.py::test_hoisted_sample_matches_per_step",
    "tests/test_trainer.py::test_best_checkpoint_written_between_save_intervals",
    "tests/test_trainer.py::test_checkpoint_scan_layout_roundtrip",
    "tests/test_trainer.py::test_grad_accumulation",
    "tests/test_trainer.py::test_grad_accumulation_partial_flush",
    "tests/test_trainer.py::test_grad_accumulation_poisoned_window_skipped",
    "tests/test_trainer.py::test_nonfinite_batch_skipped",
    "tests/test_trainer.py::test_sigterm_preemption_checkpoint",
    "tests/test_trainer.py::test_trainer_end_to_end",
    "tests/test_vocoder_training.py::test_discriminators_and_gan_steps",
    "tests/test_vocoder_training.py::test_gan_superstep_updates_and_guards",
    "tests/test_vocoder_training.py::test_vocoder_short_training_reduces_loss",
    "tests/test_vocos_bucket_invariance.py::test_lens_masked_decode_bucket_invariant",
    "tests/test_vocos_bucket_invariance.py::test_lens_masked_rows_independent_of_neighbors",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    slow = pytest.mark.slow
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in SLOW_TESTS:
            item.add_marker(slow)
