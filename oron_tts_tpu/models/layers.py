"""DiT building blocks in flax.linen, feature-last [B, T, C] layout.

Numerical parity targets the reference modules
(/root/reference/src/models/modules.py): AdaLN-gated DiT blocks, RoPE
attention with key-padding masks, grouped-conv position embedding,
ConvNeXtV2 text blocks with GRN, sinusoidal timestep MLP.

Conventions:
- params live in float32; ``dtype`` selects the compute precision
  (bfloat16 on TPU for training/inference, float32 for parity tests)
- all shapes are static; masks are boolean [B, T]
- RoPE tables are built host-side per sequence length and passed in
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_embedding(
    t: jnp.ndarray, dim: int, scale: float = 1000.0, theta: float = 10000.0
) -> jnp.ndarray:
    """[B] → [B, dim]: cat(sin, cos) with the reference's frequency layout."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(theta) / (half - 1))
    )
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def rope_tables(seq_len: int, dim_head: int, theta: float = 10000.0) -> tuple[np.ndarray, np.ndarray]:
    """Precompute RoPE cos/sin [seq_len, dim_head] (rotate-half convention)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def apply_rope(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """q, k: [B, H, T, D]; cos/sin: [T, D]."""

    def rot_half(x: jnp.ndarray) -> jnp.ndarray:
        half = x.shape[-1] // 2
        return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)

    cos = cos[None, None].astype(q.dtype)
    sin = sin[None, None].astype(q.dtype)
    return q * cos + rot_half(q) * sin, k * cos + rot_half(k) * sin


def apply_rope_lanes(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    heads: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RoPE on the padding-free lanes layout: q, k [B, T, H·D]; cos/sin [T, D].

    The rotation is per head (identical freqs for every head), expressed as
    reshapes around the elementwise math — XLA fuses them, so no [B,H,T,D]
    tensor materializes (the whole point of the layout, ops/flash_attention
    "heads-in-lanes").
    """
    B, T, HD = q.shape
    d = HD // heads

    def rot(x: jnp.ndarray) -> jnp.ndarray:
        x4 = x.reshape(B, T, heads, d)
        half = d // 2
        r = jnp.concatenate([-x4[..., half:], x4[..., :half]], axis=-1)
        return r.reshape(B, T, HD)

    cos_l = jnp.tile(cos, (1, heads))[None].astype(q.dtype)  # [1, T, H·D]
    sin_l = jnp.tile(sin, (1, heads))[None].astype(q.dtype)
    return q * cos_l + rot(q) * sin_l, k * cos_l + rot(k) * sin_l


def text_position_table(dim: int, max_pos: int = 8192, theta: float = 10000.0) -> np.ndarray:
    """Sinusoidal positions for the text encoder: cat(cos, sin) per position."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    angles = np.outer(np.arange(max_pos, dtype=np.float64), freqs)
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


class RMSNorm(nn.Module):
    """Root-mean-square norm (reference modules.py:15-26; kept for parity —
    unused by the DiT, available for custom blocks)."""

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return normed * weight.astype(x.dtype)


class TimestepEmbedding(nn.Module):
    dim: int
    freq_embed_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = sinusoidal_embedding(t, self.freq_embed_dim).astype(self.dtype)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_in")(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(h)


class GroupedConv1d(nn.Module):
    """Grouped 1-D conv as K statically shifted grouped matmuls.

    Same parameter layout as ``nn.Conv(dim, (k,), feature_group_count=g)``
    (kernel [k, cin/g, dim], bias [dim]) so checkpoints and the torch
    converters are unaffected. Measured on v5e (Base, T=1664): ~0.6 ms/
    forward faster than XLA's grouped-convolution path in-model (RTF
    0.0443 → 0.0403) — but XLA compile time for the 31-einsum graph is
    pathological (~173 s for one fwd+bwd vs 19 s for nn.Conv, and +250 s
    on the Base synthesize path), so ConvPositionEmbedding does NOT use
    it by default. Kept for experimentation.
    """

    dim: int
    kernel_size: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        cin = x.shape[-1]
        g = self.groups
        cin_g, out_g = cin // g, self.dim // g
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, cin_g, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # [k, cin_g, dim] -> [k, cin_g, g, out_g]: output feature o belongs
        # to group o // out_g and reads inputs g*cin_g .. g*cin_g+cin_g-1
        k = kernel.astype(self.dtype).reshape(
            self.kernel_size, cin_g, g, out_g
        )
        x = x.astype(self.dtype)
        b, t = x.shape[0], x.shape[1]
        pad = self.kernel_size // 2
        xp = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)]).reshape(
            b, t + 2 * pad, g, cin_g
        )
        out = None
        for i in range(self.kernel_size):
            tap = jax.lax.slice_in_dim(xp, i, i + t, axis=1)  # [B,T,g,cin_g]
            term = jnp.einsum("btgi,igo->btgo", tap, k[i])
            out = term if out is None else out + term
        return out.reshape(b, t, self.dim) + bias.astype(self.dtype)


class _PallasGroupedConv(nn.Module):
    """nn.Conv-compatible params, forward via ops.grouped_conv (Mish fused).

    mish(0) = 0, so fusing Mish before the caller's padding re-mask is
    exact: masked rows end up 0 either way.
    """

    dim: int
    kernel_size: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from oron_tts_tpu.ops.grouped_conv import grouped_conv1d_pallas

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1] // self.groups, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return grouped_conv1d_pallas(
            x.astype(self.dtype), kernel.astype(self.dtype), bias,
            self.groups, True,
        )


class ConvPositionEmbedding(nn.Module):
    """Two grouped 1-D convs (k=31, groups=16) with Mish, padding re-masked.

    ``impl="pallas"`` uses the forward-only MXU kernel
    (ops/grouped_conv.py) — inference paths only; training keeps nn.Conv
    for its backward. Falls back to XLA when the shape doesn't tile
    (dim % 128, group width dividing 128).
    """

    dim: int
    kernel_size: int = 31
    groups: int = 16
    dtype: Dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        use_pallas = (
            self.impl == "pallas"
            and self.dim % 128 == 0
            and x.shape[-1] == self.dim
            and 128 % (self.dim // self.groups) == 0
        )
        if mask is not None:
            m = mask[..., None]
            x = jnp.where(m, x, 0.0)
        for name in ("conv1", "conv2"):
            if use_pallas:
                x = _PallasGroupedConv(
                    self.dim,
                    kernel_size=self.kernel_size,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=name,
                )(x)
            else:
                x = nn.Conv(
                    self.dim,
                    kernel_size=(self.kernel_size,),
                    padding="SAME",
                    feature_group_count=self.groups,
                    dtype=self.dtype,
                    name=name,
                )(x)
                x = mish(x)
            if mask is not None:
                x = jnp.where(mask[..., None], x, 0.0)
        return x


class DepthwiseConv1d(nn.Module):
    """Depthwise 1-D conv as K statically shifted multiply-adds.

    Numerically identical to ``nn.Conv(dim, (k,), feature_group_count=dim)``
    with the SAME parameter layout (kernel [k, 1, dim], bias [dim]) so
    checkpoints and torch converters are unaffected — but it lowers to pure
    vectorized fused work instead of XLA's grouped-convolution path, which
    on TPU ran the vocoder's dwconvs at ~1 TFLOP/s-class throughput.
    """

    dim: int
    kernel_size: int = 7
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        pad = self.dilation * (self.kernel_size // 2)
        t = x.shape[-2]
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
        out = None
        for i in range(self.kernel_size):
            tap = jax.lax.slice_in_dim(
                xp, i * self.dilation, i * self.dilation + t, axis=-2
            )
            term = tap * kernel[i, 0]
            out = term if out is None else out + term
        return out + bias.astype(self.dtype)


class GRN(nn.Module):
    """Global Response Normalization over the time axis (ConvNeXt V2)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        # safe L2 norm: jnp.sqrt has an inf gradient at exactly 0 (torch
        # subgradients it to 0), and batch-padded all-zero rows would
        # poison every weight gradient with 0·inf = NaN
        sumsq = jnp.sum(jnp.square(x), axis=1, keepdims=True)
        gx = jnp.sqrt(jnp.maximum(sumsq, 1e-24))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma.astype(x.dtype) * (x * nx) + beta.astype(x.dtype) + x


class ConvNeXtV2Block(nn.Module):
    dim: int
    intermediate_dim: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = DepthwiseConv1d(
            self.dim,
            kernel_size=7,
            dilation=self.dilation,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim, dtype=self.dtype, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return residual + x


class AdaLayerNorm(nn.Module):
    """6-parameter AdaLN producing MSA shift/scale/gate and MLP shift/scale/gate.

    ``mods`` overrides the ``Dense(silu(emb))`` projection with a
    precomputed modulation row — the sampler hoists these matmuls out of
    the Euler loop because they depend only on the (static) timestep
    schedule, not on x (see dit.py precompute_t_mods). A 1-D row is
    broadcast over the batch (every CFG row shares the step's t).
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray | None,
        mods: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if mods is None:
            mods = nn.Dense(
                self.dim * 6,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="linear",
            )(nn.silu(emb))
        elif mods.ndim == 1:
            mods = mods[None, :]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mods, 6, axis=-1
        )
        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        out = normed * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormFinal(nn.Module):
    """2-parameter final AdaLN; ``mods`` overrides like AdaLayerNorm."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray | None,
                 mods: jnp.ndarray | None = None) -> jnp.ndarray:
        if mods is None:
            mods = nn.Dense(
                self.dim * 2,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="linear",
            )(nn.silu(emb))
        elif mods.ndim == 1:
            mods = mods[None, :]
        scale, shift = jnp.split(mods, 2, axis=-1)
        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        return normed * (1 + scale)[:, None] + shift[:, None]


class QDense(nn.Module):
    """Dense with int8 weights for serving (ops/quantized_matmul.py).

    Drop-in for nn.Dense once the params are converted by
    dit.quantize_dit_params: ``kernel`` [K, N] becomes ``kernel_q`` int8
    [K, N] + ``scale`` f32 [N] (per-output-channel symmetric); ``bias``
    is unchanged. ``mode="int8"`` = w8a16 Pallas dequant-in-kernel;
    ``mode="int8_dynamic"`` = w8a8 dynamic-activation int8 MXU dot.
    Inference-only: there is deliberately no VJP.
    """

    features: int
    dtype: Dtype = jnp.float32
    mode: str = "int8"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from oron_tts_tpu.ops.quantized_matmul import (
            quantized_matmul,
            quantized_matmul_ref,
            w8a8_matmul,
        )

        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros,
            (in_features, self.features), jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        if self.mode == "int8_dynamic":
            y = w8a8_matmul(x, kernel_q, scale)
        elif self.mode == "int8":
            if jax.default_backend() == "tpu":
                y = quantized_matmul(x, kernel_q, scale)
            else:
                y = quantized_matmul_ref(x, kernel_q, scale)
        else:
            raise ValueError(f"unknown quant mode: {self.mode!r}")
        return y + bias.astype(y.dtype)


def make_dense(
    features: int, dtype: Dtype, name: str, quant: str | None = None
) -> nn.Module:
    """nn.Dense, or QDense when a quant mode is set (serving-only)."""
    if quant:
        return QDense(features, dtype=dtype, mode=quant, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class Attention(nn.Module):
    """Bidirectional self-attention with RoPE and key-padding masking.

    ``attn_impl`` overrides ``use_flash`` when set: one of "einsum",
    "lanes" (heads-in-lanes flash — padding-free [B, T, H·D] tensors, the
    TPU default via use_flash), "flash" (classic [B·H, T, 64] layout),
    "packed" (two-head lane packing), or "skip" (identity over V —
    measurement-only ablation that keeps projections but removes the
    attention op itself).
    """

    dim: int
    heads: int
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    attn_impl: str | None = None
    quant: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        rope: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, T, _ = x.shape
        inner = self.heads * self.dim_head
        impl = self.attn_impl or ("lanes" if self.use_flash else "einsum")
        # the lanes kernel tiles the H·D axis in 128-lane chunks with whole
        # heads per chunk; any other geometry would leave trailing lanes
        # unwritten (silent garbage for the last head). Auto-selected lanes
        # falls back to the classic layout; an explicit override errors.
        if impl == "lanes":
            lanes_ok = inner <= 128 or (
                inner % 128 == 0 and 128 % self.dim_head == 0
            )
            if not lanes_ok:
                if self.attn_impl == "lanes":
                    raise ValueError(
                        f"attn_impl='lanes' needs heads*dim_head <= 128 or a "
                        f"multiple of 128 with dim_head dividing 128; got "
                        f"heads={self.heads}, dim_head={self.dim_head}"
                    )
                impl = "flash"

        qf = make_dense(inner, self.dtype, "to_q", self.quant)(x)
        kf = make_dense(inner, self.dtype, "to_k", self.quant)(x)
        vf = make_dense(inner, self.dtype, "to_v", self.quant)(x)

        # padding is a length prefix throughout the framework
        kv_lens = (
            jnp.sum(mask.astype(jnp.int32), axis=-1)
            if mask is not None
            else jnp.full((B,), T, jnp.int32)
        )
        interpret = jax.default_backend() == "cpu"

        if impl == "lanes":
            # stays in [B, T, H·D] end to end: no 64→128 lane padding, no
            # head transposes (docs/KERNELS.md "heads-in-lanes")
            from oron_tts_tpu.ops.flash_attention import flash_attention_lanes

            q, k = (
                apply_rope_lanes(qf, kf, rope[0], rope[1], self.heads)
                if rope is not None else (qf, kf)
            )
            out = flash_attention_lanes(
                q, k, vf, kv_lens, self.heads, interpret
            )
        else:
            def heads_first(y: jnp.ndarray) -> jnp.ndarray:
                return y.reshape(
                    B, T, self.heads, self.dim_head
                ).transpose(0, 2, 1, 3)

            q, k, v = heads_first(qf), heads_first(kf), heads_first(vf)
            if rope is not None:
                q, k = apply_rope(q, k, rope[0], rope[1])

            if impl == "skip":
                out = v + 0.0 * q
            elif impl in ("flash", "packed"):
                from oron_tts_tpu.ops.flash_attention import (
                    flash_attention_packed,
                    flash_attention_trainable,
                )

                if impl == "packed":
                    out = flash_attention_packed(
                        q, k, v, kv_lens=kv_lens, interpret=interpret
                    )
                else:
                    out = flash_attention_trainable(q, k, v, kv_lens, interpret)
            else:
                scale = 1.0 / math.sqrt(self.dim_head)
                logits = jnp.einsum(
                    "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
                ) * scale
                if mask is not None:
                    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
                probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, inner)

        out = make_dense(self.dim, self.dtype, "to_out", self.quant)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out


class FeedForward(nn.Module):
    """Linear -> GELU(tanh) -> Dropout -> Linear (reference
    modules.py:290-302).

    On TPU the training path fuses GELU + dropout into one Pallas pass
    whose backward regenerates the mask from a seed (ops/gelu_dropout.py)
    — no threefry bit generation (~32 ms/step at Base, docs/KERNELS.md
    "Dropout threefry") and no mask residual. ``ORON_FUSED_GELU_DROPOUT``:
    "0" forces the reference XLA path (ablation), "interpret" enables the
    kernel in interpreter mode off-TPU (CPU e2e tests).
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    quant: str | None = None
    # when False, the caller owns the remat boundary around the fused op
    # (DiTBlock widens it to include its LN+modulation so the region's
    # input is the already-saved residual stream — see DiTBlock)
    own_remat: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from oron_tts_tpu.ops.gelu_dropout import fused_active

        inner = int(self.dim * self.mult)
        if fused_active(self.dropout, deterministic):
            from oron_tts_tpu.ops.gelu_dropout import (
                gelu_dropout,
                seed_from_key,
            )

            rate = float(self.dropout)
            interp = jax.default_backend() != "tpu"

            # remat region must span the WHOLE FFN: the custom-call
            # kernel is opaque to XLA's own remat pass, so any narrower
            # boundary materializes a [B, T, 4*dim] tensor per layer —
            # BOTH the kernel's input (its VJP residual) and its output
            # (out_proj's dW residual) — measured 19.3 G / 19.9 G
            # compile OOMs vs the 14.9 G unfused baseline, where XLA
            # recomputes the same values by seeing through gelu+mask
            # HLOs. The backward instead recomputes the two Dense
            # matmuls + one kernel pass (~2.4 ms/layer).
            def ffn_body(mdl, xv):
                seed = seed_from_key(mdl.make_rng("dropout"))
                pre = make_dense(inner, mdl.dtype, "in_proj", mdl.quant)(xv)
                h = gelu_dropout(pre, seed, rate, interp)
                return make_dense(mdl.dim, mdl.dtype, "out_proj",
                                  mdl.quant)(h)

            if self.own_remat:
                return nn.checkpoint(ffn_body)(self, x)
            return ffn_body(self, x)
        x = make_dense(inner, self.dtype, "in_proj", self.quant)(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return make_dense(self.dim, self.dtype, "out_proj", self.quant)(x)


class DiTBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64
    ff_mult: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    attn_impl: str | None = None
    quant: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray | None,
        mask: jnp.ndarray | None = None,
        rope: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        deterministic: bool = True,
        tmods: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        normed, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNorm(
            self.dim, dtype=self.dtype, name="attn_norm"
        )(x, t, mods=tmods)
        attn_out = Attention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            dtype=self.dtype,
            use_flash=self.use_flash,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="attn",
        )(normed, mask=mask, rope=rope, deterministic=deterministic)
        x = x + gate_msa[:, None] * attn_out

        from oron_tts_tpu.ops.gelu_dropout import fused_active

        if fused_active(self.dropout, deterministic):
            # widen the fused-FFN remat region to include the (param-free)
            # LN + AdaLN modulation: the region's input becomes the
            # residual stream x — already live for the residual add — so
            # no extra [B, T, dim] modulated tensor is saved per layer
            # (measured: the narrower FFN-only region was +1.05 GB and
            # missed the no-remat HBM fit by 1.4 MB at Base B=12)
            def ff_region(mdl, xs, smlp, shmlp):
                fn = nn.LayerNorm(
                    use_bias=False, use_scale=False, epsilon=1e-6,
                    dtype=mdl.dtype, name="ff_norm",
                )(xs)
                fn = fn * (1 + smlp[:, None]) + shmlp[:, None]
                return FeedForward(
                    dim=mdl.dim, mult=mdl.ff_mult, dropout=mdl.dropout,
                    dtype=mdl.dtype, quant=mdl.quant, name="ff",
                    own_remat=False,
                )(fn, deterministic=deterministic)

            ff_out = nn.checkpoint(ff_region)(
                self, x, scale_mlp, shift_mlp
            )
            return x + gate_mlp[:, None] * ff_out

        ff_normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="ff_norm",
        )(x)
        ff_normed = ff_normed * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff_out = FeedForward(
            dim=self.dim, mult=self.ff_mult, dropout=self.dropout,
            dtype=self.dtype, quant=self.quant, name="ff",
        )(ff_normed, deterministic=deterministic)
        return x + gate_mlp[:, None] * ff_out
