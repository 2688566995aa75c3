"""Pallas TPU flash attention (non-causal, prefix key-padding).

Online-softmax attention tiled for the MXU: the query axis is the grid, the
KV axis is streamed block-by-block in VMEM with running max/sum rescaling.
Sized for the TTS workload (T ≤ ~3k bucketed to 128s, head_dim 64): one
(batch, head) pair's full K/V fits VMEM, so only Q is blocked.

Padding is always a length-prefix in this framework (lens_to_mask), so the
mask rides into the kernel as one scalar KV length per row in SMEM and is
materialized with iota — no [B, T] mask array traffic.

``flash_attention`` is the forward op; ``flash_attention_trainable`` adds a
custom VJP whose backward kernel recomputes the softmax statistics instead
of saving logsumexp (one extra QK matmul, zero stats plumbing — cheap at
this scale and bit-consistent with the forward)."""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2_E = 1.4426950408889634


def _flash_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float,
    masked: bool, use_exp2: bool = True,
):
    # keep matmul operands in the input dtype (bf16): the MXU runs bf16 at
    # 8x the f32 rate; accumulation stays f32 via preferred_element_type
    q = q_ref[0]  # [block_q, d]
    block_q, d = q.shape
    t_kv = k_ref.shape[1]
    num_kv = t_kv // block_k
    kv_len = lens_ref[pl.program_id(0)]  # full lens array lives in SMEM

    # exp(x) = exp2(x·log2e): folding log2e into sm_scale makes the
    # transcendental a native pow2 (measurably cheaper on the VPU) at zero
    # extra passes; the softmax value is unchanged
    s_scale = sm_scale * LOG2_E if use_exp2 else sm_scale
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    if num_kv == 1:
        # single-KV-block fast path (the swept optimum streams the whole
        # K/V per QK product): plain 2-pass softmax, no online rescaling
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_scale
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = exp_fn(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_scale  # [block_q, block_k] f32
        if masked:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = exp_fn(s - m_new)
        alpha = exp_fn(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pick_blocks(T: int, block_q: int | None, block_k: int | None) -> tuple[int, int]:
    """Largest divisor blocks under a VMEM budget for the f32 score tile.

    Swept on v5e (T=1664, D=64): streaming the WHOLE K/V per matmul with a
    large q block beats small square tiles by ~2.4x — the D=64 contraction
    starves the MXU, so fewer/bigger matmuls win.

    ``ORON_FLASH_BLOCK_Q`` overrides the automatic q-block choice (in-model
    tuning knob; read at trace time).
    """
    import os

    if block_q is None and (env_bq := os.environ.get("ORON_FLASH_BLOCK_Q")):
        block_q = int(env_bq)

    def divisors_desc(n: int) -> list[int]:
        return sorted((d for d in range(8, n + 1) if n % d == 0), reverse=True)

    if block_k is None:
        block_k = T if T <= 2048 else next(
            (d for d in divisors_desc(T) if d <= 1024), 128
        )
    else:
        while T % block_k:
            block_k //= 2
    # Score-tile budget. On the single-KV-block fast path (block_k == T) a
    # full-T q block measured ~1% faster end-to-end than the old 6 MB f32
    # cap's choice (bench RTF 0.0403 → 0.0399 at T=1600). The live bytes
    # per grid step there are ~6 B/element of the score tile — the f32
    # scores AND the bf16 prob copy fed to the PV matmul coexist — so the
    # budget counts 6 B/elem against a 15.5 MiB ceiling (scoped VMEM is
    # 16 MiB): T=1600 full-T is 15.4 MB (measured, fits); T=1664 full-T
    # would be 16.6 MB (over — previously a latent compile failure, now
    # picks 832); T=2048 picks 1024. The streaming path (block_k < T)
    # keeps ~2 f32 tiles live (acc + exp) — an 11.5 MB f32 budget there
    # blew the 16 MB scoped VMEM at T=2816 (17.99 M needed) — so it keeps
    # the 6 MB f32 (=24 B/elem-equivalent headroom) cap.
    if block_k == T:
        budget, bytes_per_elem = int(15.5 * 1024 * 1024), 6
    else:
        budget, bytes_per_elem = 6 * 1024 * 1024, 4
    if block_q is not None:
        while block_q > 8 and T % block_q:
            block_q //= 2
        if block_q < 8 or T % block_q:
            block_q = None  # override can't tile this T — use auto choice
    if block_q is None:
        max_q = max(budget // (block_k * bytes_per_elem), 8)
        block_q = next((d for d in divisors_desc(T) if d <= max_q), 128)
    return block_q, block_k


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "use_exp2",
                     "dim_semantics"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    kv_lens: jnp.ndarray | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
    use_exp2: bool = True,
    dim_semantics: tuple[str, str] | None = None,
) -> jnp.ndarray:
    """q, k, v: [B, H, T, D]. Padding via kv_lens [B] (or a prefix kv_mask
    [B, T], reduced to lengths). T must be a multiple of 8.

    Returns [B, H, T, D] in q's dtype.
    """
    B, H, T, D = q.shape
    block_q, block_k = _pick_blocks(T, block_q, block_k)
    sm_scale = 1.0 / math.sqrt(D)

    masked = kv_mask is not None or kv_lens is not None
    if kv_lens is None:
        if kv_mask is not None:
            kv_lens = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)
        else:
            kv_lens = jnp.full((B,), T, jnp.int32)

    bh = B * H
    qf = q.reshape(bh, T, D)
    kf = k.reshape(bh, T, D)
    vf = v.reshape(bh, T, D)
    lens_f = jnp.broadcast_to(
        kv_lens.astype(jnp.int32)[:, None], (B, H)
    ).reshape(bh)

    compiler_params = None
    if dim_semantics is not None:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=dim_semantics
        )
    grid = (bh, T // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, sm_scale=sm_scale, masked=masked,
            use_exp2=use_exp2,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * T * D * bh,
            bytes_accessed=3 * bh * T * D * 2,
            transcendentals=bh * T * T,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(lens_f, qf, kf, vf)
    return out.reshape(B, H, T, D)


# ── two-head lane packing ────────────────────────────────────────────────
#
# The D=64 contraction (QK) and D=64 output (PV) each use only half the
# MXU's 128-deep/128-wide array; measured on v5e the kernel's matmuls run
# at ~21% of the chip's square-matmul rate — consistent with Mosaic
# zero-padding both to 128. Block-diagonal packing puts the SECOND head's
# work in those wasted lanes:
#
#   q_pack [bq, 128]  = [q_h0 | q_h1]
#   k2     [2T, 128]  = [[k_h0 | 0], [0 | k_h1]]   (block diagonal)
#   s_cat  [bq, 2T]   = q_pack @ k2^T = [s_h0 | s_h1]
#   v2     [2T, 128]  = [[v_h0 | 0], [0 | v_h1]]
#   o_cat  [bq, 128]  = softmax_per_half(s_cat) @ v2 = [o_h0 | o_h1]
#
# 2x the raw MACs (the zero blocks) at ~4x the utilization → ~2x net.
# Softmax reductions run per T-half (lane offsets are 128-multiples).


def _flash_packed_kernel(
    lens_ref, q_ref, k2_ref, v2_ref, o_ref, *, t_kv: int, sm_scale: float,
    masked: bool,
):
    q = q_ref[0]  # [block_q, 2D]
    block_q = q.shape[0]
    kv_len = lens_ref[pl.program_id(0)]
    s_scale = sm_scale * LOG2_E

    s_cat = jax.lax.dot_general(
        q, k2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * s_scale  # [block_q, 2T] = [s_h0 | s_h1]
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, 2 * t_kv), 1)
        col = jnp.where(col >= t_kv, col - t_kv, col)
        s_cat = jnp.where(col < kv_len, s_cat, NEG_INF)

    s0 = s_cat[:, :t_kv]
    s1 = s_cat[:, t_kv:]
    m0 = jnp.max(s0, axis=-1, keepdims=True)
    m1 = jnp.max(s1, axis=-1, keepdims=True)
    p0 = jnp.exp2(s0 - m0)
    p1 = jnp.exp2(s1 - m1)
    l0 = jnp.sum(p0, axis=-1, keepdims=True)
    l1 = jnp.sum(p1, axis=-1, keepdims=True)
    p_cat = jnp.concatenate(
        [p0.astype(v2_ref.dtype), p1.astype(v2_ref.dtype)], axis=-1
    )
    acc = jax.lax.dot(
        p_cat, v2_ref[0], preferred_element_type=jnp.float32
    )  # [block_q, 2D] = [o_h0 | o_h1]
    d2 = acc.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, d2), 1)
    denom = jnp.where(lane < d2 // 2, l0, l1)
    o_ref[0] = (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


def _pack_heads(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, H, T, D] → even/odd head pairs [B, H/2, T, D] each."""
    return x[:, 0::2], x[:, 1::2]


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret")
)
def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: jnp.ndarray | None = None,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two-head lane-packed flash attention (H must be even).

    q, k, v: [B, H, T, D] with D=64-class head dims; returns [B, H, T, D].
    """
    B, H, T, D = q.shape
    if H % 2:
        return flash_attention(q, k, v, kv_lens=kv_lens, interpret=interpret)
    sm_scale = 1.0 / math.sqrt(D)
    masked = kv_lens is not None
    if kv_lens is None:
        kv_lens = jnp.full((B,), T, jnp.int32)

    h2 = H // 2
    q_e, q_o = _pack_heads(q)
    k_e, k_o = _pack_heads(k)
    v_e, v_o = _pack_heads(v)
    qp = jnp.concatenate([q_e, q_o], axis=-1).reshape(B * h2, T, 2 * D)
    zk = jnp.zeros_like(k_e)
    k2 = jnp.concatenate([
        jnp.concatenate([k_e, zk], axis=-1),
        jnp.concatenate([zk, k_o], axis=-1),
    ], axis=-2).reshape(B * h2, 2 * T, 2 * D)
    zv = jnp.zeros_like(v_e)
    v2 = jnp.concatenate([
        jnp.concatenate([v_e, zv], axis=-1),
        jnp.concatenate([zv, v_o], axis=-1),
    ], axis=-2).reshape(B * h2, 2 * T, 2 * D)

    lens_f = jnp.broadcast_to(
        kv_lens.astype(jnp.int32)[:, None], (B, h2)
    ).reshape(B * h2)

    if block_q is None:
        # f32 s_cat tile [block_q, 2T] under a ~6MB budget
        budget = 6 * 1024 * 1024
        max_q = max(budget // (2 * T * 4), 8)
        block_q = next(
            (d for d in range(max_q, 7, -1) if T % d == 0), 8
        )
    grid = (B * h2, T // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_packed_kernel, t_kv=T, sm_scale=sm_scale, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((B * h2, T, 2 * D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, 2 * D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * T, 2 * D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * T, 2 * D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * T * T * D * B * H,
            bytes_accessed=5 * B * H * T * D * 2,
            transcendentals=B * H * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lens_f, qp, k2, v2)
    out = out.reshape(B, h2, T, 2, D).transpose(0, 1, 3, 2, 4)
    return out.reshape(B, H, T, D)


# ── heads-in-lanes layout (no [B, H, T, 64] tensors at all) ──────────────
#
# The classic layout reshapes projections to [B·H, T, 64]; TPU tiles pad
# the 64-lane minor dim to 128, so every q/k/v/o tensor (and its VJP
# residual) carries 2.0x HBM (~100 MB each at Base B=24/T=2048 — the OOM
# margin that blocks the no-remat fast path, docs/KERNELS.md). These
# kernels instead take q/k/v exactly as the Dense layers produce them —
# [B, T, H·D] (H·D = 1024 → zero padding) — and slice each head's 64 lanes
# in-register (Mosaic handles 64-offset lane slices; probed on v5e). This
# also deletes the four [B,H,T,D] transposes per attention, which XLA had
# to materialize as kernel operands.


_LANE_TILE = 128  # TPU lane width; 2 heads of D=64 per lane tile


def _flash_lanes_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, *, d: int, sm_scale: float,
    masked: bool,
):
    """One program per (batch, lane-tile, q-block); a lane tile is 128
    lanes = _LANE_TILE//d heads, processed with in-register 64-lane slices."""
    q = q_ref[0]  # [block_q, 128]
    block_q, lanes = q.shape
    t_kv = k_ref.shape[1]
    kv_len = lens_ref[pl.program_id(0)]
    s_scale = sm_scale * LOG2_E
    k_all = k_ref[0]
    v_all = v_ref[0]
    if masked:
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1) < kv_len
        )
    outs = []
    for h in range(lanes // d):  # static unroll (2 heads per lane tile)
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_scale
        if masked:
            s = jnp.where(col_valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot(
            p.astype(v_all.dtype), v_all[:, sl],
            preferred_element_type=jnp.float32,
        )
        outs.append(acc / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_lanes_fwd_stats_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, d: int,
    sm_scale: float,
):
    """Forward + per-row softmax stats for the stats-reusing backward.

    Identical math to ``_flash_lanes_kernel`` (masked path), additionally
    writing lse2 = m + log2(l) per (head, query row) — the single number
    the backward needs to reconstruct p = exp2(s·scale − lse2) without
    redoing the max/sum reductions (measured 19 ms of the 22-layer
    backward at the Base train shape, docs/KERNELS.md round-5 notes).
    """
    q = q_ref[0]  # [block_q, 128]
    block_q, lanes = q.shape
    t_kv = k_ref.shape[1]
    kv_len = lens_ref[pl.program_id(0)]
    s_scale = sm_scale * LOG2_E
    k_all = k_ref[0]
    v_all = v_ref[0]
    col_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1) < kv_len
    )
    outs, lses = [], []
    for h in range(lanes // d):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_scale
        s = jnp.where(col_valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot(
            p.astype(v_all.dtype), v_all[:, sl],
            preferred_element_type=jnp.float32,
        )
        outs.append(acc / jnp.maximum(l, 1e-30))
        lses.append(jnp.transpose(
            m + jnp.log2(jnp.maximum(l, 1e-30))
        ))  # [1, block_q] along lanes
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.concatenate(lses, axis=0)  # [heads/tile, block_q]


def _lanes_block_q(T: int, budget_bytes: int) -> int:
    """Largest divisor of T within the f32-score-tile VMEM budget.

    Must DIVIDE T: the grid is (…, T // block_q) and a non-dividing
    block would leave the last T % block_q rows unwritten (silent
    garbage in outputs/gradients). Every T has divisor 1, so this never
    falls back to a non-divisor; sub-8 blocks are rare (prime-ish T
    outside the padded product paths) and merely slow."""
    max_q = max(budget_bytes // (T * 4), 8)
    return max(d for d in range(1, min(T, max_q) + 1) if T % d == 0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _flash_lanes_fwd_call(q, k, v, kv_lens, heads, interpret=False):
    B, T, HD = q.shape
    D = HD // heads
    sm_scale = 1.0 / math.sqrt(D)
    masked = kv_lens is not None
    if kv_lens is None:
        kv_lens = jnp.full((B,), T, jnp.int32)
    n_lane_tiles = max(HD // _LANE_TILE, 1)
    tile = min(_LANE_TILE, HD)
    # one f32 score tile live at a time (plus its bf16 p copy); q/k/v lane
    # tiles are ~0.5 MB, so the score tile can take the classic
    # single-KV-block budget (block_q=1024 at T=2048). r4 sweep at the
    # train shape found 4608/9216/18432 KB (block_q 512/1024/2048) within
    # noise of each other — the default stays 9 MB.
    fwd_kb = int(os.environ.get("ORON_LANES_FWD_BUDGET_KB", 9 * 1024))
    block_q = _lanes_block_q(T, fwd_kb * 1024)
    out = pl.pallas_call(
        functools.partial(
            _flash_lanes_kernel, d=D, sm_scale=sm_scale, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        grid=(B, n_lane_tiles, T // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, tile), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, tile), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, tile), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, tile), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * T * HD * B,
            bytes_accessed=3 * B * T * HD * 2,
            transcendentals=B * heads * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q, k, v)
    return out


def _flash_lanes_bwd_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    *, d: int, block_q: int, sm_scale: float, masked: bool,
):
    """One program per (batch, lane-tile); fori over q blocks, static loop
    over the tile's heads. dK/dV accumulate as f32 [T, 128] carries.

    p is reconstructed from the forward's saved lse2 stats
    (``p = exp2(s·scale − lse2)``) — no max/sum reductions here; the QK
    recompute itself stays (a [T, T] p residual would be absurd)."""
    t_kv, lanes = k_ref.shape[1], k_ref.shape[2]
    num_q = t_kv // block_q
    kv_len = lens_ref[pl.program_id(0)]
    k_all = k_ref[0]
    v_all = v_ref[0]
    s_scale = sm_scale * LOG2_E
    if masked:
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1) < kv_len
        )

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(lanes // d):
            sl = slice(h * d, (h + 1) * d)
            qh = q[:, sl]
            doh = do[:, sl]
            s = jax.lax.dot_general(
                qh, k_all[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s_scale
            if masked:
                s = jnp.where(col_valid, s, NEG_INF)
            # lse_ref is [1, 1, T, heads/tile] (caller pre-transposes in
            # XLA): rows slice straight off the ref as a column vector —
            # Mosaic supports pl.ds on refs but not lax.dynamic_slice on
            # values
            p = jnp.exp2(
                s - lse_ref[0, 0, pl.ds(qi * block_q, block_q), h:h + 1]
            )
            dp = jax.lax.dot_general(
                doh.astype(v_all.dtype), v_all[:, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(doh * o[:, sl], axis=-1, keepdims=True)
            ds = p * (dp - delta) * sm_scale
            ds_lp = ds.astype(q.dtype)
            p_lp = p.astype(q.dtype)
            dq_heads.append(jax.lax.dot(
                ds_lp, k_all[:, sl], preferred_element_type=jnp.float32,
            ))
            dk_heads.append(jax.lax.dot_general(
                ds_lp, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dv_heads.append(jax.lax.dot_general(
                p_lp, doh.astype(q.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dq_ref[0, pl.ds(qi * block_q, block_q), :] = jnp.concatenate(
            dq_heads, axis=-1
        ).astype(dq_ref.dtype)
        dk_acc = dk_acc + jnp.concatenate(dk_heads, axis=-1)
        dv_acc = dv_acc + jnp.concatenate(dv_heads, axis=-1)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((t_kv, lanes), jnp.float32)
    dv0 = jnp.zeros((t_kv, lanes), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _flash_lanes_fwd_stats_call(q, k, v, kv_lens, heads, interpret=False):
    """Forward returning (out, lse2 stats [B, n_tiles, heads/tile, T])."""
    B, T, HD = q.shape
    D = HD // heads
    sm_scale = 1.0 / math.sqrt(D)
    n_lane_tiles = max(HD // _LANE_TILE, 1)
    tile = min(_LANE_TILE, HD)
    hpt = tile // D  # heads per lane tile
    fwd_kb = int(os.environ.get("ORON_LANES_FWD_BUDGET_KB", 9 * 1024))
    block_q = _lanes_block_q(T, fwd_kb * 1024)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_lanes_fwd_stats_kernel, d=D, sm_scale=sm_scale
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, HD), q.dtype),
            jax.ShapeDtypeStruct((B, n_lane_tiles, hpt, T), jnp.float32),
        ),
        grid=(B, n_lane_tiles, T // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, tile), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, tile), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, tile), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, tile), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hpt, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * T * HD * B,
            bytes_accessed=3 * B * T * HD * 2,
            transcendentals=B * heads * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q, k, v)
    return out, lse


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _flash_lanes_bwd_call(q, k, v, kv_lens, out, dout, lse, heads,
                          interpret=False):
    B, T, HD = q.shape
    D = HD // heads
    sm_scale = 1.0 / math.sqrt(D)
    n_lane_tiles = max(HD // _LANE_TILE, 1)
    tile = min(_LANE_TILE, HD)
    hpt = tile // D
    # 4 f32 [block_q, T] tiles live per head iteration — the heads run
    # sequentially. Default budget 6144 KB → block_q=512 at T=2048, the
    # r4 sweep optimum on v5e (22-layer fwd+bwd: 1536 KB/bq128 309 ms,
    # 3072/256 261, 6144/512 257, 12288/1024 267, 24576/2048 274 —
    # docs/KERNELS.md; tiny [32, T] blocks measured 2805 vs 2087 ms/step
    # in r3: small matmuls starve the MXU). Sweep again on new hardware
    # via ORON_LANES_BWD_BUDGET_KB + scripts/roofline_train.py --phase attn.
    budget_kb = int(os.environ.get("ORON_LANES_BWD_BUDGET_KB", 6144))
    block_q = _lanes_block_q(T, budget_kb * 1024)
    full = pl.BlockSpec((1, T, tile), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    # stats arrive [B, tiles, heads/tile, T] from the forward (lane-
    # friendly writes); transpose the tiny tensor once in XLA so the
    # kernel can slice per-q-block rows as column vectors off the ref
    lse = jnp.swapaxes(lse, -1, -2)  # -> [B, tiles, T, hpt]
    lse_spec = pl.BlockSpec((1, 1, T, hpt), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_lanes_bwd_kernel, d=D, block_q=block_q,
            sm_scale=sm_scale, masked=True,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, HD), q.dtype),
            jax.ShapeDtypeStruct((B, T, HD), k.dtype),
            jax.ShapeDtypeStruct((B, T, HD), v.dtype),
        ),
        grid=(B, n_lane_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), full, full, full,
                  full, full, lse_spec],
        out_specs=(full, full, full),
        cost_estimate=pl.CostEstimate(
            flops=10 * T * T * HD * B,
            bytes_accessed=6 * B * T * HD * 2,
            transcendentals=B * heads * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        kv_lens.astype(jnp.int32), q, k, v, out, dout, lse,
    )
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_lanes(q, k, v, kv_lens, heads, interpret=False):
    """Differentiable flash attention over the padding-free lanes layout.

    q, k, v: [B, T, H·D] exactly as the QKV Dense layers emit them; returns
    [B, T, H·D]. Saves ~2x HBM on every attention tensor and residual vs
    the [B, H, T, 64] layout (64→128 lane padding) and removes the head
    transposes — the enabler for the no-remat training fast path
    (docs/KERNELS.md "Base train step").
    """
    return _flash_lanes_fwd_call(q, k, v, kv_lens, heads, interpret)


def _fal_fwd(q, k, v, kv_lens, heads, interpret):
    if kv_lens is None:
        kv_lens = jnp.full((q.shape[0],), q.shape[1], jnp.int32)
    # stats-producing forward: identical outputs to _flash_lanes_fwd_call
    # plus the lse2 row stats ([B, tiles, heads/tile, T] f32, ~1.6 MB at
    # the Base train shape) that let the backward skip its max/sum
    # reductions (−19 ms of 176 over 22 layers, measured on v5e)
    out, lse = _flash_lanes_fwd_stats_call(q, k, v, kv_lens, heads,
                                           interpret)
    return out, (q, k, v, kv_lens, out, lse)


def _fal_bwd(heads, interpret, residuals, dout):
    q, k, v, kv_lens, out, lse = residuals
    dq, dk, dv = _flash_lanes_bwd_call(
        q, k, v, kv_lens, out, dout, lse, heads, interpret
    )
    return dq, dk, dv, None


flash_attention_lanes.defvjp(_fal_fwd, _fal_bwd)


# ── backward (custom VJP) ────────────────────────────────────────────────


def _flash_bwd_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    *, block_q: int, sm_scale: float, masked: bool,
):
    """One program per (batch, head): loops q blocks, accumulates dK/dV.

    Recomputes s = qK^T and the softmax normalization per q block, then
      dP = dO V^T;  Δ = rowsum(dO ∘ O);  dS = P ∘ (dP − Δ) · scale
      dQ = dS K;    dK += dS^T Q;        dV += P^T dO
    """
    t_kv, d = k_ref.shape[1], k_ref.shape[2]
    num_q = t_kv // block_q
    kv_len = lens_ref[pl.program_id(0)]
    k_all = k_ref[0]
    v_all = v_ref[0]
    # exp2 trick as in the forward: p is the same softmax value; the TRUE
    # sm_scale still multiplies ds (it is d s_raw / d q·k)
    s_scale = sm_scale * LOG2_E

    if masked:
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1) < kv_len
        )

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_scale  # [block_q, T]
        if masked:
            s = jnp.where(col_valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

        dp = jax.lax.dot_general(
            do.astype(v_all.dtype), v_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, T]
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * sm_scale  # [block_q, T] f32
        ds_lp = ds.astype(q.dtype)
        p_lp = p.astype(q.dtype)

        dq = jax.lax.dot(ds_lp, k_all, preferred_element_type=jnp.float32)
        dq_ref[0, pl.ds(qi * block_q, block_q), :] = dq.astype(dq_ref.dtype)

        dk_acc = dk_acc + jax.lax.dot_general(
            ds_lp, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, d]
        dv_acc = dv_acc + jax.lax.dot_general(
            p_lp, do.astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    dk0 = jnp.zeros((t_kv, d), jnp.float32)
    dv0 = jnp.zeros((t_kv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_block_q(T: int) -> int:
    # several f32 [block_q, T] tiles are live at once (s, p, dp, ds) plus
    # dk/dv accumulators; budget conservatively — T=2048 overflowed the
    # default 16MB scoped vmem with larger blocks
    budget = max((1536 * 1024) // (T * 4), 8)
    for d in sorted((d for d in range(8, T + 1) if T % d == 0), reverse=True):
        if d <= budget:
            return d
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bwd(q, k, v, kv_lens, out, dout, interpret=False):
    B, H, T, D = q.shape
    bh = B * H
    sm_scale = 1.0 / math.sqrt(D)
    block_q = _bwd_block_q(T)
    lens_f = jnp.broadcast_to(
        kv_lens.astype(jnp.int32)[:, None], (B, H)
    ).reshape(bh)
    full = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel, block_q=block_q, sm_scale=sm_scale, masked=True
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, T, D), q.dtype),
            jax.ShapeDtypeStruct((bh, T, D), k.dtype),
            jax.ShapeDtypeStruct((bh, T, D), v.dtype),
        ),
        grid=(bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), full, full, full,
                  full, full],
        out_specs=(full, full, full),
        cost_estimate=pl.CostEstimate(
            flops=10 * T * T * D * bh, bytes_accessed=6 * bh * T * D * 2,
            transcendentals=bh * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lens_f,
        q.reshape(bh, T, D),
        k.reshape(bh, T, D),
        v.reshape(bh, T, D),
        out.reshape(bh, T, D),
        dout.reshape(bh, T, D),
    )
    shape = (B, H, T, D)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_trainable(q, k, v, kv_lens, interpret=False):
    """Differentiable flash attention; kv_lens [B] prefix lengths."""
    return flash_attention(q, k, v, kv_lens=kv_lens, interpret=interpret)


def _fat_fwd(q, k, v, kv_lens, interpret):
    # fill None like _fal_fwd does: the backward kernel reads kv_lens
    # unconditionally, so a None residual would crash at bwd trace time
    if kv_lens is None:
        kv_lens = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    out = flash_attention(q, k, v, kv_lens=kv_lens, interpret=interpret)
    return out, (q, k, v, kv_lens, out)


def _fat_bwd(interpret, residuals, dout):
    q, k, v, kv_lens, out = residuals
    dq, dk, dv = _flash_bwd(q, k, v, kv_lens, out, dout, interpret=interpret)
    return dq, dk, dv, None


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
