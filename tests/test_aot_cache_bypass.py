"""Pin the private JAX API the AOT train-step compile depends on.

``compile_train_step_auto`` (train/trainer.py) must bypass the persistent
compilation cache: a deserialized AUTO-layout donated executable loses its
output→input aliasing and crashes at the aliased feedback call. The bypass
needs ``jax._src.compilation_cache.reset_cache`` — a PRIVATE surface.

These tests fail loudly on the JAX upgrade that removes/renames it, so the
break is caught in CI rather than as a silent behavior change at Base
scale on a TPU. (VERDICT r3 weak #3.)
"""

import jax
import pytest

from oron_tts_tpu.train import trainer as trainer_mod
from oron_tts_tpu.train.trainer import (
    _persistent_cache_api,
    persistent_cache_disabled,
)


def test_private_cache_api_still_exists():
    """If this fails, JAX moved jax._src.compilation_cache.reset_cache —
    update _persistent_cache_api (ONE place) or drop the AOT bypass."""
    assert _persistent_cache_api() is not None, (
        "jax._src.compilation_cache.reset_cache vanished in "
        f"jax=={jax.__version__}; the AOT-layout compile path is now "
        "falling back to plain jit everywhere. Fix trainer."
        "_persistent_cache_api for the new private surface."
    )


def test_context_manager_flips_and_restores_flag():
    before = bool(jax.config.jax_enable_compilation_cache)
    with persistent_cache_disabled():
        assert bool(jax.config.jax_enable_compilation_cache) is False
    assert bool(jax.config.jax_enable_compilation_cache) == before


def test_context_manager_restores_flag_on_error():
    before = bool(jax.config.jax_enable_compilation_cache)
    with pytest.raises(ValueError):
        with persistent_cache_disabled():
            raise ValueError("boom")
    assert bool(jax.config.jax_enable_compilation_cache) == before


def test_missing_api_raises_not_silently_compiles(monkeypatch):
    """When the private API is gone the bypass must REFUSE (RuntimeError →
    trainer falls back to plain jit), never compile through the cache."""
    monkeypatch.setattr(trainer_mod, "_persistent_cache_api", lambda: None)
    with pytest.raises(RuntimeError, match="plain jit"):
        with persistent_cache_disabled():
            pass  # pragma: no cover — must not enter


def test_trainer_falls_back_to_plain_jit_when_api_missing(monkeypatch, tmp_path):
    """_get_train_step catches the RuntimeError, warns, and uses the plain
    jit step (use_aot flips off) instead of crashing or cache-compiling."""
    import numpy as np

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = {
        "sample_rate": 24000, "n_mels": 100, "use_tqdm": False,
        "model": {"vocab_size": 65, "dim": 32, "depth": 1, "heads": 2,
                  "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                  "p_dropout": 0.0},
    }
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    tr = F5Trainer(config=cfg, model=model, train_loader=[],
                   log_dir=str(tmp_path / "logs"),
                   checkpoint_dir=str(tmp_path / "ckpt"))
    monkeypatch.setattr(trainer_mod, "_persistent_cache_api", lambda: None)
    tr.use_aot = True
    batch = {
        "mel": np.zeros((2, 100, 64), np.float32),
        "text_ids": np.zeros((2, 64), np.int32),
        "mel_lengths": np.asarray([64, 48], np.int32),
    }
    step = tr._get_train_step(batch, jax.random.PRNGKey(0))
    assert step is tr._train_step
    assert tr.use_aot is False


def test_aot_second_shape_with_state_format_chain():
    """Regression (r4): the SECOND bucket-shape AOT compile chains the
    first compile's concrete state_format. jax 0.9 normalizes an explicit
    default-equal input layout to None, and donated None-input + AUTO-
    output fails mlir's donation check — so follow-up compiles must pin
    the concrete format on the output side too. Crashed the alignment
    eval's multi-bucket epoch on v5e before the fix."""
    import numpy as np

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.train.trainer import (
        TrainState,
        compile_train_step_auto,
        make_lr_schedule,
        make_optimizer,
    )

    cfg = {"sample_rate": 24000, "n_mels": 100,
           "model": {"vocab_size": 65, "dim": 32, "depth": 1, "heads": 2,
                     "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                     "p_dropout": 0.0}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    import jax.numpy as jnp

    tx = make_optimizer(make_lr_schedule(1e-3, 10, 100), max_grad_norm=1.0)
    params = model.variables["params"]
    state = TrainState(params=params, opt_state=tx.init(params),
                       ema_params=jax.tree_util.tree_map(jnp.array, params),
                       step=jnp.asarray(0, jnp.int32),
                       ema_updates=jnp.asarray(0, jnp.int32))

    def mkbatch(b, t):
        return {"mel": np.random.randn(b, 100, t).astype(np.float32),
                "text_ids": np.random.randint(0, 65, (b, t)).astype(np.int32),
                "mel_lengths": np.full((b,), t, np.int32)}

    b_a, b_b = mkbatch(2, 64), mkbatch(3, 96)
    step_a, state, fmt = compile_train_step_auto(
        model.cfm, tx, 0.99, state, b_a, jax.random.PRNGKey(0))
    # dispatch one A step and leave it in flight: follow-up compiles
    # must NOT device_put the pending donated output (a redundant
    # relayout on an in-flight aliased buffer corrupts the v5e stream)
    state, m0 = step_a(state, b_a, jax.random.PRNGKey(7))
    state_before = state
    step_b, state, _ = compile_train_step_auto(
        model.cfm, tx, 0.99, state, b_b, jax.random.PRNGKey(0),
        state_format=fmt)
    assert state is state_before, (
        "compile with state_format must return the state untouched "
        "(it is already in that layout; relayout mid-flight crashes TPU)")
    assert bool(m0["ok"])
    # interleave buckets: the shared state layout must flow A->B->A
    for i, (st, b) in enumerate([(step_a, b_a), (step_b, b_b)] * 2):
        state, metrics = st(state, b, jax.random.fold_in(jax.random.PRNGKey(1), i))
        assert bool(metrics["ok"])
