"""Fused tanh-GELU + seeded dropout with mask-regenerating backward.

The reference FFN is Linear -> GELU(tanh) -> Dropout -> Linear
(/root/reference/src/models/modules.py:290-302). Under XLA the training
cost of that middle section at Base scale is dominated not by math but by
RNG + residuals: threefry bit generation for 22 per-layer [B*T, 4*dim]
masks costs ~32 ms/step, and the hardware-RNG alternative (`rbg`) saves
the bits as backward residuals (+1.5 GB, OOMs the no-remat step —
docs/KERNELS.md "Dropout threefry").

This op removes both costs structurally:

- forward: one Pallas kernel computes gelu(x) and the dropout mask from a
  counter-based hash PRNG (murmur3 finalizer over the element's GLOBAL
  index mixed with a seed — ~6 integer VPU ops/element). The mask never
  exists in HBM.
- backward: a custom VJP regenerates the exact mask from (seed, index)
  and applies dgelu(x) in the same pass. The only residual is ``x``
  itself (the pre-activation the Dense layer already produced).

The counter-based design (rather than ``pltpu.prng_random_bits``) keeps
the mask a pure function of (seed, element index): bit-identical between
forward and backward regardless of block partitioning, reproducible in
Pallas interpreter mode on CPU (where the TPU hardware PRNG primitive is
unavailable), and identical across backends.

Numerics: gelu is computed in f32 regardless of input dtype; the mask
drops with probability ``round(rate * 2^32) / 2^32`` (exact to 2.3e-10).
The stream differs from ``nn.Dropout``'s threefry — dropout is
stochastic regularization, so only self-reproducibility matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_2_OVER_PI = 0.7978845608028654
GELU_C = 0.044715


def _gelu_f32(x: jnp.ndarray) -> jnp.ndarray:
    t = jnp.tanh(SQRT_2_OVER_PI * (x + GELU_C * x * x * x))
    return 0.5 * x * (1.0 + t)


def _dgelu_f32(x: jnp.ndarray) -> jnp.ndarray:
    t = jnp.tanh(SQRT_2_OVER_PI * (x + GELU_C * x * x * x))
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * SQRT_2_OVER_PI * (
        1.0 + 3.0 * GELU_C * x * x
    )


def _keep_mask(seed: jnp.ndarray, row0: jnp.ndarray, shape,
               feat: int, threshold: int) -> jnp.ndarray:
    """Keep-mask as a pure function of (seed, global element index).

    murmur3 finalizer over ``index * prime + seed`` — full-avalanche
    mixing, so adjacent indices decorrelate. uint32 wraparound is the
    intended ring arithmetic.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = (row0.astype(jnp.uint32) + rows) * jnp.uint32(feat) + cols
    z = idx * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    z = (z ^ (z >> 16)) * jnp.uint32(0x85EB_CA6B)
    z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2_AE35)
    z = z ^ (z >> 16)
    return z >= jnp.uint32(threshold)


def _fwd_kernel(seed_ref, x_ref, o_ref, *, block_r: int, feat: int,
                threshold: int, inv_keep: float):
    x = x_ref[...].astype(jnp.float32)
    g = _gelu_f32(x)
    if threshold > 0:
        row0 = jnp.int32(pl.program_id(0)) * block_r
        keep = _keep_mask(seed_ref[0], row0, x.shape, feat, threshold)
        g = jnp.where(keep, g * inv_keep, 0.0)
    o_ref[...] = g.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dy_ref, dx_ref, *, block_r: int, feat: int,
                threshold: int, inv_keep: float):
    x = x_ref[...].astype(jnp.float32)
    d = dy_ref[...].astype(jnp.float32) * _dgelu_f32(x)
    if threshold > 0:
        row0 = jnp.int32(pl.program_id(0)) * block_r
        keep = _keep_mask(seed_ref[0], row0, x.shape, feat, threshold)
        d = jnp.where(keep, d * inv_keep, 0.0)
    dx_ref[...] = d.astype(dx_ref.dtype)


def _block_rows(rows: int, feat: int, n_bufs: int) -> int:
    """Largest divisor of ``rows`` whose f32 working set fits ~24 MB."""
    budget = 24 * 1024 * 1024
    max_r = max(budget // (feat * 4 * n_bufs), 1)
    return max(d for d in range(1, min(rows, max_r) + 1) if rows % d == 0)


def _threshold(rate: float) -> int:
    if rate <= 0.0:
        return 0
    if not 0.0 < rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1): {rate}")
    return min(int(round(rate * 2**32)), 2**32 - 1)


def _call(kernel, out_dtype, seed, arrays, rows, feat, block_r, interpret):
    spec = pl.BlockSpec((block_r, feat), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, feat), out_dtype),
        grid=(rows // block_r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec] * len(arrays),
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, *arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gelu_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float,
                 interpret: bool = False) -> jnp.ndarray:
    """gelu_tanh(x) with seeded dropout fused in one pass.

    x: [..., F]; seed: int32 scalar array (one value per call — derive it
    from a PRNG key so each layer/step gets a fresh stream); rate: static
    drop probability in [0, 1). rate=0 is pure fused GELU.
    """
    shape = x.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    feat = shape[-1]
    threshold = _threshold(rate)
    block_r = _block_rows(rows, feat, 2)
    out = _call(
        functools.partial(_fwd_kernel, block_r=block_r, feat=feat,
                          threshold=threshold,
                          inv_keep=1.0 / (1.0 - rate) if rate else 1.0),
        x.dtype, jnp.asarray(seed, jnp.int32).reshape(1),
        [x.reshape(rows, feat)], rows, feat, block_r, interpret,
    )
    return out.reshape(shape)


def _gd_fwd(x, seed, rate, interpret):
    return gelu_dropout(x, seed, rate, interpret), (x, seed)


def _gd_bwd(rate, interpret, residuals, dy):
    x, seed = residuals
    shape = x.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    feat = shape[-1]
    threshold = _threshold(rate)
    block_r = _block_rows(rows, feat, 3)
    dx = _call(
        functools.partial(_bwd_kernel, block_r=block_r, feat=feat,
                          threshold=threshold,
                          inv_keep=1.0 / (1.0 - rate) if rate else 1.0),
        x.dtype, jnp.asarray(seed, jnp.int32).reshape(1),
        [x.reshape(rows, feat), dy.reshape(rows, feat)],
        rows, feat, block_r, interpret,
    )
    return dx.reshape(shape), None


gelu_dropout.defvjp(_gd_fwd, _gd_bwd)


def fused_active(rate: float, deterministic: bool) -> bool:
    """Whether the fused GELU+dropout training path should be used.

    One gate shared by FeedForward and DiTBlock (which must agree on it:
    the block widens the remat region around the FFN exactly when the
    fused op is inside). ``ORON_FUSED_GELU_DROPOUT``: "1" enables on
    TPU, "interpret" enables off-TPU in interpreter mode (CPU e2e tests).

    DEFAULT OFF (opt-in experiment): the op itself is correct and
    HBM-clean with the block-level remat region (15.75G footprint fits),
    but the 22 unrolled per-block nn.checkpoint regions around an opaque
    custom call blew the Base train-step XLA compile past 25 minutes on
    v5e (baseline: ~2 min) — unacceptable for the shipped path. See
    docs/KERNELS.md "Fused GELU+dropout (rejected as default)".
    """
    import os

    knob = os.environ.get("ORON_FUSED_GELU_DROPOUT", "0")
    return (
        not deterministic
        and rate > 0.0
        and knob != "0"
        and (jax.default_backend() == "tpu" or knob == "interpret")
    )


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """int32 kernel seed from a JAX PRNG key (typed or raw uint32[2])."""
    data = jax.random.key_data(key).ravel()
    return jax.lax.bitcast_convert_type(data[-1], jnp.int32)
