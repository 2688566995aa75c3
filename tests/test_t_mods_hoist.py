"""Hoisted t-modulation tables (dit.precompute_t_mods).

The sampler precomputes every t-dependent matmul (timestep MLP + all
AdaLN projections) over the static step schedule once, outside the Euler
loop. These tests pin the contract: the hoisted solve equals the
per-step-recompute solve for both block layouts and both CFG modes, and
the tables themselves match what the per-step modules produce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.models.cfm import CFM, CFMConfig, sway_timesteps
from oron_tts_tpu.models.dit import DiT, precompute_t_mods

MEL = 8


def _model(scan_blocks: bool) -> tuple[CFM, dict]:
    dit = DiT(
        dim=64, depth=2, heads=2, dim_head=32, mel_dim=MEL, vocab_size=65,
        text_dim=32, conv_layers=2, dropout=0.0, scan_blocks=scan_blocks,
    )
    variables = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, MEL)),
        jnp.zeros((1, 32, MEL)), jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1,)),
    )
    # AdaLN kernels are zero-init; perturb so the hoist carries real signal
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.02 * rng.standard_normal(x.shape).astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables,
    )
    return CFM(dit, CFMConfig(n_mels=MEL)), variables


@pytest.mark.parametrize("scan_blocks", [False, True])
@pytest.mark.parametrize("cfg_strength", [2.0, 0.0])
def test_hoisted_sample_matches_per_step(scan_blocks, cfg_strength):
    cfm, variables = _model(scan_blocks)
    cond = jnp.zeros((2, 64, MEL))
    ids = jnp.ones((2, 64), jnp.int32)
    duration = jnp.array([64, 48])
    lens = jnp.array([10, 5])
    kw = dict(
        steps=4, cfg_strength=cfg_strength, sway_sampling_coef=-1.0, seed=3
    )
    hoisted, _ = cfm.sample(
        variables, cond, ids, duration, lens, hoist_t_mods=True, **kw
    )
    per_step, _ = cfm.sample(
        variables, cond, ids, duration, lens, hoist_t_mods=False, **kw
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(per_step), atol=1e-5
    )


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_tables_match_module_projections(scan_blocks):
    """Table row i == the AdaLN Dense output the module computes at step i."""
    cfm, variables = _model(scan_blocks)
    dit = cfm.backbone
    t_grid = sway_timesteps(5, -1.0)[:-1]
    te = dit.apply(variables, t_grid, method="embed_time")
    block_mods, final_mods = precompute_t_mods(
        variables["params"], te, dit.depth, dit.scan_blocks, dit.dtype
    )
    assert block_mods.shape == (dit.depth, 5, 6 * dit.dim)
    assert final_mods.shape == (5, 2 * dit.dim)

    # reproduce one step's modulation from the raw params (disk layout)
    from oron_tts_tpu.models.dit import unstack_block_params

    params = variables["params"]
    if scan_blocks:
        params = unstack_block_params(dict(params), dit.depth)
    act = jax.nn.silu(te[2])
    for i in range(dit.depth):
        lin = params[f"block{i}"]["attn_norm"]["linear"]
        want = act @ lin["kernel"] + lin["bias"]
        np.testing.assert_allclose(
            np.asarray(block_mods[i, 2]), np.asarray(want), atol=1e-6
        )
    lin = params["norm_out"]["linear"]
    np.testing.assert_allclose(
        np.asarray(final_mods[2]),
        np.asarray(act @ lin["kernel"] + lin["bias"]),
        atol=1e-6,
    )


def test_forward_cfg_accepts_t_mods_broadcast_row():
    """A 1-D modulation row broadcasts over the CFG-doubled batch."""
    cfm, variables = _model(False)
    dit = cfm.backbone
    B, T = 2, 32
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, T, MEL)),
                    jnp.float32)
    cond = jnp.zeros((B, T, MEL))
    ids = jnp.ones((B, T), jnp.int32)
    te_c = dit.apply(variables, ids, T, False, method="embed_text")
    te_u = dit.apply(variables, ids, T, True, method="embed_text")
    mask = jnp.ones((B, T), bool)
    time = jnp.full((B,), 0.25)

    te = dit.apply(variables, jnp.array([0.25]), method="embed_time")
    bm, fm = precompute_t_mods(variables["params"], te, dit.depth, False)
    with_mods = dit.apply(
        variables, x, cond, te_c, te_u, time, mask,
        method="forward_cfg", t_mods=(bm[:, 0], fm[0]),
    )
    without = dit.apply(
        variables, x, cond, te_c, te_u, time, mask, method="forward_cfg"
    )
    for a, b in zip(with_mods, without):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
