"""Fused GELU+seeded-dropout op (ops/gelu_dropout.py): numerics and the
mask-regeneration contract its backward depends on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.ops.gelu_dropout import (
    _dgelu_f32,
    gelu_dropout,
    seed_from_key,
)

INTERP = True  # CPU tests run the kernels in interpreter mode


def test_rate_zero_matches_gelu_tanh():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 256)), jnp.float32
    )
    got = gelu_dropout(x, jnp.int32(7), 0.0, INTERP)
    want = jax.nn.gelu(x, approximate=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_rate_zero_grad_matches_autodiff():
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 128)), jnp.float32
    )
    g = jax.grad(
        lambda y: jnp.sum(gelu_dropout(y, jnp.int32(3), 0.0, INTERP))
    )(x)
    want = jax.grad(lambda y: jnp.sum(jax.nn.gelu(y, approximate=True)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


def test_dropout_statistics_and_scaling():
    rate = 0.3
    x = jnp.ones((64, 512), jnp.float32) * 2.0
    out = np.asarray(gelu_dropout(x, jnp.int32(11), rate, INTERP))
    kept = out != 0.0
    frac = kept.mean()
    assert abs(frac - (1 - rate)) < 0.02, frac
    # surviving elements carry the 1/(1-rate) inverted-dropout scale
    want = float(jax.nn.gelu(jnp.float32(2.0), approximate=True)) / (1 - rate)
    np.testing.assert_allclose(out[kept], want, rtol=1e-5)


def test_same_seed_reproduces_mask():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((16, 256)), jnp.float32
    )
    a = np.asarray(gelu_dropout(x, jnp.int32(5), 0.5, INTERP))
    b = np.asarray(gelu_dropout(x, jnp.int32(5), 0.5, INTERP))
    c = np.asarray(gelu_dropout(x, jnp.int32(6), 0.5, INTERP))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_backward_regenerates_forward_mask():
    """grad must be zero exactly where the forward dropped, and equal
    dgelu/(1-rate) exactly where it kept — the regenerated mask in the
    backward kernel must match the forward bit-for-bit."""
    rate = 0.4
    rng = np.random.default_rng(3)
    # keep |x| away from gelu's zero so out==0 identifies dropped slots
    x = jnp.asarray(rng.standard_normal((32, 384)) + 3.0, jnp.float32)
    seed = jnp.int32(21)
    out = np.asarray(gelu_dropout(x, seed, rate, INTERP))
    kept = out != 0.0
    g = np.asarray(jax.grad(
        lambda y: jnp.sum(gelu_dropout(y, seed, rate, INTERP))
    )(x))
    assert (g[~kept] == 0.0).all()
    want = np.asarray(_dgelu_f32(x)) / (1 - rate)
    np.testing.assert_allclose(g[kept], want[kept], rtol=1e-4)


def test_bfloat16_io():
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((8, 128)), jnp.bfloat16
    )
    out = gelu_dropout(x, jnp.int32(1), 0.2, INTERP)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_3d_shape_roundtrip():
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 16, 128)), jnp.float32
    )
    out = gelu_dropout(x, jnp.int32(9), 0.1, INTERP)
    assert out.shape == x.shape


def test_seed_from_key_distinct():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    s1, s2 = seed_from_key(k1), seed_from_key(k2)
    assert s1.dtype == jnp.int32 and int(s1) != int(s2)


def test_invalid_rate_raises():
    x = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError):
        gelu_dropout(x, jnp.int32(0), 1.0, INTERP)
