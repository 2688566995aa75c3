"""Pallas TPU flash attention (non-causal, key-padding mask).

Online-softmax attention tiled for the MXU: the query axis is the grid, the
KV axis is streamed block-by-block in VMEM with running max/sum rescaling.
Sized for the TTS workload (T ≤ ~3k bucketed to 128s, head_dim 64): one
(batch, head) pair's full K/V fits VMEM, so only Q is blocked.

Forward-only: training uses the XLA einsum path (which autodiffs); the
sampler's 64 DiT forwards per utterance are where this kernel pays.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [block_q, d]
    block_q, d = q.shape
    t_kv = k_ref.shape[1]
    num_kv = t_kv // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_masked(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float
):
    q = q_ref[0].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    t_kv = k_ref.shape[1]
    num_kv = t_kv // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        kv_mask = mask_ref[0, pl.ds(i * block_k, block_k)]  # [block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(kv_mask[None, :], s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: [B, H, T, D]; kv_mask: [B, T] (True = valid key).

    T must be a multiple of 128 (the bucketing contract guarantees it).
    Returns [B, H, T, D] in q's dtype.
    """
    B, H, T, D = q.shape
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    while T % block_q:
        block_q //= 2
    while T % block_k:
        block_k //= 2
    sm_scale = 1.0 / math.sqrt(D)

    bh = B * H
    qf = q.reshape(bh, T, D)
    kf = k.reshape(bh, T, D)
    vf = v.reshape(bh, T, D)

    grid = (bh, T // block_q)
    q_spec = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * T * T * D * bh, bytes_accessed=3 * bh * T * D * 2,
        transcendentals=bh * T * T,
    )

    if kv_mask is None:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
            out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(qf, kf, vf)
    else:
        mask_b = jnp.broadcast_to(kv_mask[:, None, :], (B, H, T)).reshape(bh, T)
        mask_spec = pl.BlockSpec((1, T), lambda b, i: (b, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_masked, block_k=block_k, sm_scale=sm_scale
            ),
            out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
            out_specs=o_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(qf, kf, vf, mask_b)
    return out.reshape(B, H, T, D)
