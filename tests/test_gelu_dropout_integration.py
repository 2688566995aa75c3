"""Fused GELU+dropout INTEGRATION: FeedForward/DiTBlock remat regions,
rng replay under nn.checkpoint, and fused/unfused param-tree equality.

The raw op is covered by tests/test_gelu_dropout.py; these exercise the
model wiring that ORON_FUSED_GELU_DROPOUT=1 activates on TPU, via the
"interpret" knob on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("ORON_FUSED_GELU_DROPOUT", "interpret")


def _block(dropout=0.1):
    from oron_tts_tpu.models.layers import DiTBlock

    return DiTBlock(dim=64, heads=2, dim_head=32, ff_mult=2,
                    dropout=dropout)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 64 * 6)), jnp.float32)
    return x, t


def _randomize(variables, seed=9):
    """Replace zero-init leaves (AdaLN gates, proj_out) with noise so the
    FFN path actually contributes — with the reference zero-init, FFN
    grads are identically zero and dropout is invisible at the output."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    key = jax.random.PRNGKey(seed)
    out = []
    for i, leaf in enumerate(leaves):
        out.append(jax.random.normal(
            jax.random.fold_in(key, i), leaf.shape, leaf.dtype) * 0.05)
    return jax.tree_util.tree_unflatten(treedef, out)


def test_param_tree_identical_to_unfused(fused_env):
    """Both code paths must create the same params at the same paths —
    checkpoints written by one load into the other."""
    block = _block()
    x, t = _inputs()
    k = jax.random.PRNGKey(0)
    fused = block.init({"params": k, "dropout": k}, x, t,
                       deterministic=False)
    import os

    os.environ["ORON_FUSED_GELU_DROPOUT"] = "0"
    try:
        unfused = block.init({"params": k, "dropout": k}, x, t,
                             deterministic=False)
    finally:
        os.environ["ORON_FUSED_GELU_DROPOUT"] = "interpret"
    fp = {jax.tree_util.keystr(kp): v.shape for kp, v in
          jax.tree_util.tree_leaves_with_path(fused)}
    up = {jax.tree_util.keystr(kp): v.shape for kp, v in
          jax.tree_util.tree_leaves_with_path(unfused)}
    assert fp == up


def test_fused_grads_flow_and_are_finite(fused_env):
    """value_and_grad through the DiTBlock's widened remat region: the
    nn.checkpoint recompute must replay the SAME dropout mask (flax rng
    determinism under lifted remat) and produce finite grads for every
    FFN param."""
    block = _block()
    x, t = _inputs()
    k = jax.random.PRNGKey(1)
    variables = _randomize(block.init({"params": k, "dropout": k}, x, t,
                                      deterministic=False))

    def loss(params):
        out = block.apply({"params": params}, x, t, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    ff = [(jax.tree_util.keystr(kp), g) for kp, g in leaves
          if "'ff'" in jax.tree_util.keystr(kp)]
    assert ff, "no FFN grads found"
    for name, g in ff:
        arr = np.asarray(g, np.float32)
        assert np.isfinite(arr).all(), name
        assert np.abs(arr).sum() > 0, f"zero grad: {name}"


def test_fused_apply_deterministic_per_rng(fused_env):
    block = _block()
    x, t = _inputs()
    k = jax.random.PRNGKey(2)
    variables = _randomize(block.init({"params": k, "dropout": k}, x, t,
                                      deterministic=False))
    run = lambda seed: np.asarray(block.apply(  # noqa: E731
        variables, x, t, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(seed)},
    ))
    a, b, c = run(3), run(3), run(4)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_eval_path_ignores_fused_knob(fused_env):
    """deterministic=True must use the plain path (bit-stable eval) no
    matter what the knob says."""
    block = _block()
    x, t = _inputs()
    k = jax.random.PRNGKey(4)
    variables = _randomize(block.init({"params": k, "dropout": k}, x, t,
                                      deterministic=False))
    out1 = np.asarray(block.apply(variables, x, t, deterministic=True))
    import os

    os.environ["ORON_FUSED_GELU_DROPOUT"] = "0"
    try:
        out2 = np.asarray(block.apply(variables, x, t, deterministic=True))
    finally:
        os.environ["ORON_FUSED_GELU_DROPOUT"] = "interpret"
    np.testing.assert_array_equal(out1, out2)
