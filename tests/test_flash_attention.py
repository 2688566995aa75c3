"""Flash-attention kernel vs reference einsum attention (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, kv_mask=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


@pytest.mark.parametrize("T", [128, 384])
def test_flash_matches_reference(T):
    rng = np.random.default_rng(0)
    B, H, D = 2, 2, 64
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_with_padding_mask():
    rng = np.random.default_rng(1)
    B, H, T, D = 2, 2, 256, 64
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    lens = np.array([256, 130])
    mask = np.arange(T)[None, :] < lens[:, None]
    out = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                          interpret=True)
    ref = ref_attention(q, k, v, kv_mask=mask)
    # valid-query rows must match; padded-key columns never contribute
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    rng = np.random.default_rng(2)
    B, H, T, D = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=3e-2
    )


def test_dit_with_flash_matches_einsum():
    """Full DiT forward: use_flash (interpret) vs einsum path."""
    from oron_tts_tpu.models.dit import DiT

    kwargs = dict(dim=64, depth=1, heads=2, dim_head=64, mel_dim=8,
                  text_dim=16, conv_layers=1, dropout=0.0)
    rng = np.random.default_rng(3)
    B, T = 2, 128
    x = rng.standard_normal((B, T, 8)).astype(np.float32)
    text = rng.integers(0, 65, (B, T)).astype(np.int32)
    time = np.full((B,), 0.3, np.float32)
    lens = np.array([T, T - 37])
    mask = np.arange(T)[None, :] < lens[:, None]

    base = DiT(**kwargs)
    variables = base.init(jax.random.PRNGKey(0), x, x, text, time, mask=mask)
    ref_out = base.apply(variables, x, cond=x, text_ids=text, time=time, mask=mask)

    # on the CPU test backend the Attention module auto-selects interpret mode
    flash = DiT(**kwargs, use_flash=True)
    flash_out = flash.apply(variables, x, cond=x, text_ids=text, time=time,
                            mask=mask)
    np.testing.assert_allclose(
        np.asarray(flash_out), np.asarray(ref_out), atol=1e-4, rtol=1e-3
    )


def test_packed_two_head_matches_einsum():
    """Lane-packed 2-head kernel vs plain softmax attention (masked+unmasked)."""
    import math

    import jax.numpy as jnp

    from oron_tts_tpu.ops.flash_attention import flash_attention_packed

    B, H, T, D = 2, 4, 128, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, T, D), jnp.float32)
    k = jax.random.normal(k2, (B, H, T, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, T, D), jnp.float32)
    kv_lens = jnp.asarray([T, T - 40], jnp.int32)
    mask = jnp.arange(T)[None, :] < kv_lens[:, None]

    scale = 1 / math.sqrt(D)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    masked_logits = jnp.where(mask[:, None, None, :], logits, -1e30)

    ref = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(masked_logits, -1), v)
    out = flash_attention_packed(q, k, v, kv_lens=kv_lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    ref_u = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(logits, -1), v)
    out_u = flash_attention_packed(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u), atol=2e-5)

    # odd head count falls back to the unpacked kernel
    out_odd = flash_attention_packed(
        q[:, :3], k[:, :3], v[:, :3], kv_lens=kv_lens, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_odd), np.asarray(ref[:, :3]), atol=2e-5
    )
