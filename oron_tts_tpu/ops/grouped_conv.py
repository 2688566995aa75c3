"""Pallas grouped 1-D convolution for ConvPositionEmbedding (inference).

XLA's grouped-convolution path runs the DiT's two k=31 groups=16 convs at
~1.3 ms per Base forward (T=1664) on v5e, and the shifted-matmul XLA
rewrite that beat it (RTF 0.0443 → 0.0403) compiles pathologically
(docs/KERNELS.md). This kernel gets the same arithmetic onto the MXU with
one pallas_call: weights are expanded to block-diagonal [128, 128] lane
tiles host-side (the only redundancy is the off-diagonal zeros inside a
tile, 2× FLOPs for the 64-channel groups — still 8× fewer than a dense
conv), and each program streams the padded [T, 128] lane tile through K
statically shifted [T,128]×[128,128] matmuls with f32 accumulation.

Forward-only by design: training keeps nn.Conv (whose backward compiles
and runs fine); the sampler/serving paths opt in via DiT(conv_impl=
"pallas"). Parameter layout is exactly nn.Conv's (kernel [K, cin/g, C],
bias [C]) so checkpoints are unaffected.

Reference behavior being matched: the grouped Conv1d pair in
/root/reference/src/models/modules.py:110-141 (ConvPositionEmbedding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, ksize: int, t: int,
                 fuse_mish: bool):
    acc = None
    for i in range(ksize):
        tap = x_ref[0, i: i + t, :]
        term = jax.lax.dot(
            tap, w_ref[0, i], preferred_element_type=jnp.float32
        )
        acc = term if acc is None else acc + term
    acc = acc + b_ref[pl.program_id(1)][None, :].astype(jnp.float32)
    if fuse_mish:
        acc = acc * jnp.tanh(jax.nn.softplus(acc))
    o_ref[0] = acc.astype(o_ref.dtype)


def expand_block_diag(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[K, cin_g, C] grouped-conv weights → [C/128, K, 128, 128] lane tiles.

    Lane tile c holds the block-diagonal weight for output channels
    [128c, 128c+128): 128/cin_g diagonal cin_g×cin_g blocks, zeros
    elsewhere, so a dense [T,128]×[128,128] matmul computes the grouped
    contraction exactly.
    """
    ksize, cin_g, chans = kernel.shape
    if chans % LANE:
        raise ValueError(f"C={chans} must be a multiple of {LANE}")
    if LANE % cin_g or chans // groups != cin_g:
        raise ValueError(
            f"group width {cin_g} must divide {LANE} (cin == cout assumed)"
        )
    n_tiles, nb = chans // LANE, LANE // cin_g
    # o = (tile c, block j, oc); kernel[k, i, o] is nonzero only for
    # i_local in block j: W[c, k, (j1,i), (j2,o)] = eye[j1,j2]·kr[k,i,c,j2,o]
    kr = kernel.reshape(ksize, cin_g, n_tiles, nb, cin_g)
    eye = jnp.eye(nb, dtype=kernel.dtype)
    w = jnp.einsum("ab,kicbo->ckaibo", eye, kr)
    return w.reshape(n_tiles, ksize, LANE, LANE)


def _conv_mish_ref(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    groups: int, fuse_mish: bool,
) -> jnp.ndarray:
    """XLA reference (differentiable): grouped conv + bias (+ Mish)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), "SAME", feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias.astype(x.dtype)
    if fuse_mish:
        y = y * jnp.tanh(jax.nn.softplus(y))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def grouped_conv1d_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    fuse_mish: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME-padded grouped conv over [B, T, C] (optionally fused Mish).

    Forward runs the Pallas kernel; the custom VJP differentiates the XLA
    reference instead (nn.Conv-style backward compiles and runs fine), so
    the op is safe inside a training graph — at the cost of one extra
    reference forward during the backward pass.
    """
    return _pallas_forward(x, kernel, bias, groups, fuse_mish, interpret)


def _gconv_fwd(x, kernel, bias, groups, fuse_mish, interpret):
    return (
        _pallas_forward(x, kernel, bias, groups, fuse_mish, interpret),
        (x, kernel, bias),
    )


def _gconv_bwd(groups, fuse_mish, interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x2, k2, b2: _conv_mish_ref(x2, k2, b2, groups, fuse_mish),
        x, kernel, bias,
    )
    return vjp(g)


grouped_conv1d_pallas.defvjp(_gconv_fwd, _gconv_bwd)


@functools.partial(
    jax.jit, static_argnames=("groups", "fuse_mish", "interpret")
)
def _pallas_forward(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    fuse_mish: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    batch, t, chans = x.shape
    ksize = kernel.shape[0]
    n_tiles = chans // LANE

    dtype = x.dtype
    w = expand_block_diag(kernel.astype(dtype), groups)
    b_tiles = bias.reshape(n_tiles, LANE)

    pad_l = ksize // 2
    pad_r = ksize - 1 - pad_l
    pad_r += (-(t + pad_l + pad_r)) % 8  # keep row tiling 8-aligned
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    tp = t + pad_l + pad_r

    return pl.pallas_call(
        functools.partial(
            _conv_kernel, ksize=ksize, t=t, fuse_mish=fuse_mish
        ),
        out_shape=jax.ShapeDtypeStruct((batch, t, chans), dtype),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tp, LANE), lambda bi, ci: (bi, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksize, LANE, LANE), lambda bi, ci: (ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole bias table (a [n_tiles, 128] block would break the
            # 8-sublane tiling rule); the kernel indexes by program_id
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, LANE), lambda bi, ci: (bi, 0, ci),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w, b_tiles)
