"""Diffusion Transformer backbone for F5-TTS flow matching (JAX/flax).

Functional redesign of reference /root/reference/src/models/dit.py: instead of
the reference's stateful text-embedding cache, the text embedding is computed
once by the caller (hoisted out of the ODE loop) and passed in; the CFG
double-batch packing is an explicit method. Drop flags are traced scalars so
CFG dropout works inside jit without recompilation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from oron_tts_tpu.models.layers import (
    AdaLayerNormFinal,
    ConvPositionEmbedding,
    DiTBlock,
    TimestepEmbedding,
    rope_tables,
)
from oron_tts_tpu.models.text_embed import TextEmbedding


class InputEmbedding(nn.Module):
    """concat([x, cond, text_embed]) → Dense(dim) + residual conv-pos embed."""

    mel_dim: int
    text_dim: int
    out_dim: int
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text_embed: jnp.ndarray,
        drop_audio_cond: jnp.ndarray | bool = False,
        mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        drop = jnp.asarray(drop_audio_cond)
        cond = jnp.where(drop, jnp.zeros_like(cond), cond)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(
            jnp.concatenate([x, cond, text_embed.astype(x.dtype)], axis=-1)
        )
        pos = ConvPositionEmbedding(
            dim=self.out_dim, dtype=self.dtype, impl=self.conv_impl,
            name="conv_pos_embed",
        )(h, mask=mask)
        return pos + h


class _DiTBlockScanBody(DiTBlock):
    """DiTBlock with the (carry, out) return shape nn.scan expects."""

    def __call__(self, x, t, mask, rope, deterministic, tmods=None):  # noqa: D102
        return super().__call__(x, t, mask, rope, deterministic, tmods), None


class DiT(nn.Module):
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    dropout: float = 0.1
    mel_dim: int = 100
    vocab_size: int = 65
    text_dim: int = 512
    conv_layers: int = 4
    gradient_checkpointing: bool = False
    dtype: Any = jnp.float32
    use_flash: bool = False
    attn_impl: str | None = None
    scan_blocks: bool = False
    conv_impl: str = "xla"
    remat_policy: str | None = None
    quant: str | None = None  # "int8" | "int8_dynamic" — serving-only

    def setup(self) -> None:
        self.time_embed = TimestepEmbedding(self.dim, dtype=self.dtype)
        self.text_embed = TextEmbedding(
            vocab_size=self.vocab_size,
            text_dim=self.text_dim,
            conv_layers=self.conv_layers,
            dtype=self.dtype,
        )
        self.input_embed = InputEmbedding(
            self.mel_dim, self.text_dim, self.dim, dtype=self.dtype,
            conv_impl=self.conv_impl,
        )
        block_kwargs = dict(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            ff_mult=self.ff_mult,
            dropout=self.dropout,
            dtype=self.dtype,
            use_flash=self.use_flash,
            attn_impl=self.attn_impl,
            quant=self.quant,
        )
        if self.scan_blocks:
            # One block traced/compiled once, iterated by lax.scan over a
            # stacked [depth, ...] parameter axis — cuts Base-config cold
            # compile from minutes to the single-block cost. On-disk
            # checkpoints stay in the unrolled block{i} layout via
            # stack_block_params/unstack_block_params.
            body = _DiTBlockScanBody
            if self.gradient_checkpointing:
                body = nn.remat(
                    body, static_argnums=(5,), policy=self._remat_policy()
                )
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                # tmods (last arg) is scanned over its leading [depth] axis;
                # None (the training path) contributes no leaves to scan
                in_axes=(
                    nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast, 0
                ),
                length=self.depth,
            )
            self.blocks = scan(**block_kwargs, name="blocks")
        else:
            block = DiTBlock
            if self.gradient_checkpointing:
                block = nn.remat(
                    DiTBlock, static_argnums=(5,), policy=self._remat_policy()
                )
            self.blocks = [
                block(**block_kwargs, name=f"block{i}")
                for i in range(self.depth)
            ]
        self.norm_out = AdaLayerNormFinal(self.dim, dtype=self.dtype)
        self.proj_out = nn.Dense(
            self.mel_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    def _remat_policy(self):
        """Named jax.checkpoint policy for rematerialized blocks.

        None = save nothing (max recompute, min memory). "dots_saveable"
        keeps MXU outputs and recomputes only elementwise work — measured
        on v5e: see docs/KERNELS.md (train-step memory/throughput trade).
        """
        if not self.remat_policy:
            return None
        import jax

        return getattr(jax.checkpoint_policies, self.remat_policy)

    def embed_text(
        self, text_ids: jnp.ndarray, seq_len: int, drop_text: jnp.ndarray | bool = False
    ) -> jnp.ndarray:
        """Hoistable text embedding (compute once per CFG branch, reuse per step)."""
        return self.text_embed(text_ids, seq_len, drop_text=drop_text)

    def embed_time(self, time: jnp.ndarray) -> jnp.ndarray:
        """Hoistable timestep embedding: [S] → [S, dim].

        The sampler evaluates this once over the whole (static) timestep
        schedule; precompute_t_mods then folds the per-block AdaLN
        projections the same way (see module docstring note on hoisting).
        """
        return self.time_embed(time)

    def _transformer(
        self,
        h: jnp.ndarray,
        t: jnp.ndarray | None,
        mask: jnp.ndarray | None,
        deterministic: bool,
        t_mods: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        seq_len = h.shape[1]
        cos, sin = rope_tables(seq_len, self.dim_head)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        block_mods, final_mods = t_mods if t_mods is not None else (None, None)
        if self.scan_blocks:
            h, _ = self.blocks(h, t, mask, rope, deterministic, block_mods)
        else:
            for i, blk in enumerate(self.blocks):
                h = blk(
                    h, t, mask, rope, deterministic,
                    None if block_mods is None else block_mods[i],
                )
        h = self.norm_out(h, t, mods=final_mods)
        return self.proj_out(h)

    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text_ids: jnp.ndarray,
        time: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        drop_audio_cond: jnp.ndarray | bool = False,
        drop_text: jnp.ndarray | bool = False,
        deterministic: bool = True,
        text_embed: jnp.ndarray | None = None,
        t_mods: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        """Predict the velocity field [B, T, mel_dim].

        Args:
            x: noised mel [B, T, mel_dim]; cond: conditioning mel [B, T, mel_dim]
            text_ids: [B, Nt]; time: [B] or scalar; mask: valid frames [B, T]
            text_embed: precomputed by embed_text() to skip the text encoder
            t_mods: precomputed (block_mods, final_mods) for this timestep
                (precompute_t_mods); skips time_embed and every AdaLN matmul
        """
        if t_mods is not None:
            t = None
        else:
            if time.ndim == 0:
                time = jnp.broadcast_to(time, (x.shape[0],))
            t = self.time_embed(time)
        if text_embed is None:
            text_embed = self.embed_text(text_ids, x.shape[1], drop_text=drop_text)
        h = self.input_embed(
            x, cond, text_embed, drop_audio_cond=drop_audio_cond, mask=mask
        )
        return self._transformer(h, t, mask, deterministic, t_mods=t_mods)

    def forward_cfg(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        text_embed_cond: jnp.ndarray,
        text_embed_uncond: jnp.ndarray,
        time: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        t_mods: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """CFG double-batch: one transformer pass over [cond; uncond].

        Mirrors reference dit.py:200-215 — the unconditional branch zeroes the
        audio conditioning and uses the dropped-text embedding.

        With ``t_mods`` (precompute_t_mods output for this step) the
        timestep MLP and all AdaLN projections are skipped — both CFG rows
        share the step's t, so one precomputed modulation row broadcasts
        over the doubled batch.

        Returns (pred, null_pred), each [B, T, mel_dim].
        """
        if t_mods is not None:
            t2 = None
        else:
            if time.ndim == 0:
                time = jnp.broadcast_to(time, (x.shape[0],))
            t = self.time_embed(time)
            t2 = jnp.concatenate([t, t], axis=0)

        h_cond = self.input_embed(
            x, cond, text_embed_cond, drop_audio_cond=False, mask=mask
        )
        h_uncond = self.input_embed(
            x, cond, text_embed_uncond, drop_audio_cond=True, mask=mask
        )
        h = jnp.concatenate([h_cond, h_uncond], axis=0)
        mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
        out = self._transformer(h, t2, mask2, deterministic=True, t_mods=t_mods)
        b = x.shape[0]
        return out[:b], out[b:]


# ── block-parameter layout adapters (scan_blocks interop) ─────────────────
#
# The on-disk/torch-interop contract is the unrolled layout
# (params["block0"] … params["block{depth-1}"], matching reference
# dit.py's transformer_blocks ModuleList); scan_blocks=True models hold one
# stacked params["blocks"] subtree with a leading [depth] axis instead.


def stack_block_params(params: dict, depth: int) -> dict:
    """Unrolled ``block{i}`` params → stacked ``blocks`` (scan layout)."""
    import jax

    out = {k: v for k, v in params.items() if not k.startswith("block")}
    blocks = [params[f"block{i}"] for i in range(depth)]
    out["blocks"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks
    )
    return out


def unstack_block_params(params: dict, depth: int) -> dict:
    """Stacked ``blocks`` params → unrolled ``block{i}`` (disk layout)."""
    import jax

    out = {k: v for k, v in params.items() if k != "blocks"}
    stacked = params["blocks"]
    for i in range(depth):
        out[f"block{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out


_QUANT_TARGETS = frozenset(
    {"to_q", "to_k", "to_v", "to_out", "in_proj", "out_proj"}
)


def quantize_dit_params(params: dict) -> dict:
    """Convert DiT params to the QDense layout (serving-time, in-memory).

    Every attention/FFN projection kernel (`_QUANT_TARGETS` — the hot
    Linears; AdaLN is hoisted out of the loop instead, precompute_t_mods)
    becomes ``kernel_q`` int8 + per-output-channel ``scale`` f32; biases
    and everything else pass through. Works on both block layouts (the
    stacked scan layout quantizes per (depth, channel)). Checkpoints on
    disk are never quantized — this runs after load, keeping the
    reference's full-precision checkpoint contract
    (/root/reference/src/utils/checkpoint.py).
    """
    from collections.abc import Mapping

    from oron_tts_tpu.ops.quantized_matmul import quantize_weight

    def walk(node: Any, name: str) -> Any:
        if isinstance(node, Mapping):
            if name in _QUANT_TARGETS and "kernel" in node:
                q, s = quantize_weight(node["kernel"])
                out = {"kernel_q": q, "scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def precompute_t_mods(
    params: dict,
    t_emb: jnp.ndarray,
    depth: int,
    scan_blocks: bool,
    dtype: Any = jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """AdaLN modulation tables for a whole (static) timestep schedule.

    Every t-dependent matmul in a DiT forward — the per-block
    ``AdaLayerNorm`` ``Dense(6·dim)`` and the final ``Dense(2·dim)`` —
    depends only on the timestep, never on x. During sampling the timestep
    grid is known before the Euler loop, so these are evaluated here ONCE
    for all S steps and the loop body just slices a row per step:
    per DiT forward that removes ~dim·6·dim·depth weight bytes of HBM
    traffic (~1/3 of Base's total weight reads; the AdaLN matmuls run at
    M=2 rows, pure bandwidth). The reference recomputes them per step
    (/root/reference/src/models/modules.py:202-219 inside every block
    forward).

    Args:
        params: DiT "params" collection (either block layout).
        t_emb: [S, dim] — ``DiT.embed_time`` over the step grid.
        depth/scan_blocks: the model's block layout.
        dtype: the model compute dtype (matches nn.Dense promotion).

    Returns:
        (block_mods [depth, S, 6·dim], final_mods [S, 2·dim]) — at step i
        pass ``(block_mods[:, i], final_mods[i])`` as ``t_mods``.
    """
    act = nn.silu(t_emb).astype(dtype)

    def dense(x, layer):  # nn.Dense numerics: promote all operands to dtype
        return x @ layer["kernel"].astype(dtype) + layer["bias"].astype(dtype)

    if scan_blocks:
        lin = params["blocks"]["attn_norm"]["linear"]
        block_mods = (
            jnp.einsum("sd,zdk->zsk", act, lin["kernel"].astype(dtype))
            + lin["bias"].astype(dtype)[:, None, :]
        )
    else:
        block_mods = jnp.stack(
            [
                dense(act, params[f"block{i}"]["attn_norm"]["linear"])
                for i in range(depth)
            ]
        )
    final_mods = dense(act, params["norm_out"]["linear"])
    return block_mods, final_mods


def adapt_block_layout(params: dict, depth: int, scan_blocks: bool) -> dict:
    """Convert DiT params between layouts if needed (no-op when matching)."""
    if scan_blocks and "blocks" not in params:
        return stack_block_params(params, depth)
    if not scan_blocks and "blocks" in params:
        return unstack_block_params(params, depth)
    return params
