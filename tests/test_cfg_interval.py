"""Guidance interval (CFM.sample cfg_interval, arXiv:2404.07724).

Opt-in throughput lever with NO reference analogue (the reference guides
every Euler step, flow.py:244-267). Contract pinned here:

- cfg_interval=None and (0.0, 1.0) are numerically IDENTICAL (the
  no-interval path is the exact single-scan sampler);
- an interval covering no steps equals the cond-only sampler
  (cfg_strength=0 path);
- a partial interval matches an independent hand-rolled Euler loop that
  switches between forward and forward_cfg per step;
- the facade threads the knob end to end (jit cache keyed on it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.models.cfm import CFM, CFMConfig, sway_timesteps
from oron_tts_tpu.models.dit import DiT

MEL = 8


def _model(scan_blocks: bool = False) -> tuple[CFM, dict]:
    dit = DiT(
        dim=64, depth=2, heads=2, dim_head=32, mel_dim=MEL, vocab_size=65,
        text_dim=32, conv_layers=2, dropout=0.0, scan_blocks=scan_blocks,
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


def _inputs(batch=2, T=64):
    cond = jnp.zeros((batch, T, MEL))
    ids = jnp.ones((batch, T), jnp.int32)
    duration = jnp.array([T, T - 16][:batch])
    lens = jnp.array([10, 5][:batch])
    return cond, ids, duration, lens


def test_full_interval_identical_to_none():
    cfm, variables = _model()
    cond, ids, duration, lens = _inputs()
    kw = dict(steps=4, cfg_strength=2.0, sway_sampling_coef=-1.0, seed=3)
    ref, _ = cfm.sample(variables, cond, ids, duration, lens, **kw)
    full, _ = cfm.sample(
        variables, cond, ids, duration, lens, cfg_interval=(0.0, 1.0), **kw
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(full))


def test_empty_interval_equals_cond_only():
    cfm, variables = _model()
    cond, ids, duration, lens = _inputs()
    kw = dict(steps=4, sway_sampling_coef=None, seed=3)
    none_guided, _ = cfm.sample(
        variables, cond, ids, duration, lens, cfg_strength=2.0,
        cfg_interval=(0.99, 0.999), **kw  # t grid = {0, .25, .5, .75}
    )
    cond_only, _ = cfm.sample(
        variables, cond, ids, duration, lens, cfg_strength=0.0, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(none_guided), np.asarray(cond_only)
    )


@pytest.mark.parametrize("scan_blocks", [False, True])
@pytest.mark.parametrize("sway", [None, -1.0])
def test_partial_interval_matches_manual_loop(scan_blocks, sway):
    """Hand-rolled Euler loop switching forward/forward_cfg per step."""
    cfm, variables = _model(scan_blocks)
    cond, ids, duration, lens = _inputs()
    steps, cfg_strength, lo, hi = 6, 2.0, 0.3, 0.8
    noise = jax.random.normal(jax.random.PRNGKey(7), cond.shape)

    out, _ = cfm.sample(
        variables, cond, ids, duration, lens, steps=steps,
        cfg_strength=cfg_strength, sway_sampling_coef=sway, noise=noise,
        cfg_interval=(lo, hi),
    )

    # independent reference (mirrors the sampler's masking/grid contract)
    from oron_tts_tpu.models.cfm import lens_to_mask

    T = cond.shape[1]
    cond_mask = lens_to_mask(lens, T)[..., None]
    step_cond = jnp.where(cond_mask, cond, 0.0)
    attn_mask = lens_to_mask(duration, T)
    t_grid = sway_timesteps(steps, sway)
    te_c = cfm.backbone.apply(variables, ids, T, False, method="embed_text")
    te_u = cfm.backbone.apply(variables, ids, T, True, method="embed_text")
    x = jnp.where(attn_mask[..., None], noise, 0.0)
    for i in range(steps):
        t = float(t_grid[i])
        t_b = jnp.full((cond.shape[0],), t_grid[i])
        if lo <= t <= hi:
            pred, null = cfm.backbone.apply(
                variables, x, step_cond, te_c, te_u, t_b, attn_mask,
                method="forward_cfg",
            )
            v = pred + (pred - null) * cfg_strength
        else:
            v = cfm.backbone.apply(
                variables, x, step_cond, ids, t_b,
                mask=attn_mask, text_embed=te_c,
            )
        x = x + v * (t_grid[i + 1] - t_grid[i])
    expect = jnp.where(cond_mask, cond, x)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-5
    )


def test_interval_validation():
    cfm, variables = _model()
    cond, ids, duration, lens = _inputs()
    with pytest.raises(ValueError):
        cfm.sample(variables, cond, ids, duration, lens,
                   cfg_interval=(0.5, 0.2))
    with pytest.raises(ValueError):
        cfm.sample(variables, cond, ids, duration, lens,
                   cfg_interval=(-0.1, 0.5))


def test_facade_threads_cfg_interval():
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 2,
                     "ff_mult": 2, "text_dim": 32, "conv_layers": 1,
                     "p_dropout": 0.0}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    v = model.init_params(0)
    # zero-init proj_out would make every velocity 0 (guided == ungided)
    rng = np.random.default_rng(1)
    model.variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        v,
    )
    base = model.synthesize("сайн байна уу", n_steps=4, seed=0)
    gated = model.synthesize("сайн байна уу", n_steps=4, seed=0,
                             cfg_interval=(0.0, 0.5))
    assert base.shape == gated.shape
    assert np.isfinite(gated).all()
    assert not np.allclose(base, gated)  # late steps lost guidance
    # the jit cache must key on the interval (distinct executables)
    full = model.synthesize("сайн байна уу", n_steps=4, seed=0,
                            cfg_interval=(0.0, 1.0))
    np.testing.assert_allclose(base, full, atol=1e-6)
    # batched path accepts it too
    wavs = model.synthesize_batch(
        ["сайн байна уу", "за тэгье"], n_steps=4, seed=0,
        cfg_interval=(0.0, 0.5),
    )
    assert len(wavs) == 2 and all(np.isfinite(w).all() for w in wavs)
