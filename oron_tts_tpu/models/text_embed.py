"""Text embedding: token lookup + sinusoidal positions + ConvNeXtV2 stack.

Contract parity with reference /root/reference/src/models/encoder.py:15-96:
IDs are shifted by +1 so 0 is the filler/padding token (the collator pads
with -1); sequences are cropped/padded to the mel length; ``drop_text``
replaces all ids with the filler before embedding (CFG unconditional
branch); padding positions are re-zeroed after every conv block.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.models.layers import ConvNeXtV2Block, text_position_table


@functools.lru_cache(maxsize=4)
def _position_table(dim: int, max_pos: int) -> np.ndarray:
    return text_position_table(dim, max_pos)


class TextEmbedding(nn.Module):
    vocab_size: int
    text_dim: int
    conv_layers: int = 0
    conv_mult: int = 2
    max_pos: int = 8192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_ids: jnp.ndarray,
        seq_len: int,
        drop_text: jnp.ndarray | bool = False,
    ) -> jnp.ndarray:
        """[B, Nt] int ids (−1 = padding) → [B, seq_len, text_dim].

        drop_text may be a traced scalar bool (batch-level CFG dropout).
        """
        shifted = text_ids + 1  # 0 becomes the filler token
        nt = shifted.shape[1]
        if nt >= seq_len:
            shifted = shifted[:, :seq_len]
        else:
            shifted = jnp.pad(shifted, ((0, 0), (0, seq_len - nt)))

        pad_mask = shifted == 0  # True where filler/padding

        drop = jnp.asarray(drop_text)
        shifted = jnp.where(drop, jnp.zeros_like(shifted), shifted)

        emb = nn.Embed(
            self.vocab_size + 1, self.text_dim, dtype=self.dtype, name="embed"
        )(shifted)

        if self.conv_layers > 0:
            pos = _position_table(self.text_dim, self.max_pos)[:seq_len]
            emb = emb + pos[None].astype(emb.dtype)
            keep = ~pad_mask[..., None]
            emb = jnp.where(keep, emb, 0.0)
            for i in range(self.conv_layers):
                emb = ConvNeXtV2Block(
                    self.text_dim,
                    self.text_dim * self.conv_mult,
                    dtype=self.dtype,
                    name=f"block{i}",
                )(emb)
                emb = jnp.where(keep, emb, 0.0)
        return emb
