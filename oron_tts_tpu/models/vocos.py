"""Vocos-style ISTFT vocoder (mel → waveform) in flax.

Two head modes:
- ``"real_imag"``: the reference's from-scratch decoder
  (/root/reference/src/models/decoder.py:27-103) — Linear head predicts
  real/imag STFT coefficients, normalized ISTFT.
- ``"mag_phase"``: the official pretrained Vocos (charactr/vocos-mel-24khz)
  head — Linear predicts log-magnitude ‖ phase, x = exp(m)·e^{iφ} with
  magnitude clipping, non-normalized ISTFT. ``layer_scale=True`` adds the
  per-block gamma the official checkpoint carries, so its weights port
  directly via convert_vocos_state_dict.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.models.layers import DepthwiseConv1d
from oron_tts_tpu.ops.stft import istft_real


class VocosConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = DepthwiseConv1d(
            self.dim, kernel_size=7, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale:
            gamma = self.param(
                "gamma", nn.initializers.constant(1e-6), (self.dim,)
            )
            x = x * gamma.astype(x.dtype)
        return residual + x


class VocosDecoder(nn.Module):
    """mel [B, n_mels, T] → waveform [B, T*hop_length]."""

    n_mels: int = 100
    dim: int = 512
    n_layers: int = 8
    intermediate_dim: int = 1536
    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 24000
    head_mode: str = "real_imag"  # or "mag_phase"
    layer_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, lens: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """Decode; with ``lens`` [B], produce bucket-invariant output.

        Serving decodes whole padded length-groups in one call; the solo
        path decodes [1, bucket] the same way. With ``lens``, row i's
        first lens[i]·hop samples are an exact function of its own first
        lens[i] mel frames, independent of the bucket: activations are
        re-zeroed beyond lens after the embed conv and after EVERY block
        (pad frames otherwise carry bias-propagated values that leak back
        through the ~27-frame conv receptive field), pad-frame STFT
        coefficients are zeroed, and the ISTFT window envelope is
        overlap-added over each row's own lens frames (the full-bucket
        envelope would normalize the last ~n_fft samples differently per
        pad count). Verified batched == solo in tests/test_vocos_*.
        """
        x = mel.swapaxes(-1, -2)  # [B, T, n_mels]
        frame_valid = None
        if lens is not None:
            frame_valid = (
                jnp.arange(x.shape[1])[None, :] < lens[:, None]
            )[..., None]

        def remask(y: jnp.ndarray) -> jnp.ndarray:
            return y if frame_valid is None else jnp.where(frame_valid, y, 0.0)

        x = nn.Conv(
            self.dim, kernel_size=(7,), padding="SAME", dtype=self.dtype,
            name="embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_pre")(x)
        x = remask(x)
        for i in range(self.n_layers):
            x = VocosConvNeXtBlock(
                self.dim, self.intermediate_dim,
                layer_scale=self.layer_scale, dtype=self.dtype, name=f"block{i}",
            )(x)
            x = remask(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_post")(x)

        n_bins = self.n_fft // 2 + 1
        out = nn.Dense(n_bins * 2, dtype=self.dtype, name="head")(x)  # [B, T, 2F]
        out = remask(out.astype(jnp.float32))

        if self.head_mode == "mag_phase":
            mag, phase = out[..., :n_bins], out[..., n_bins:]
            mag = jnp.exp(jnp.clip(mag, max=4.605170185988091))  # official Vocos clips magnitude at 1e2
            re = (mag * jnp.cos(phase)).swapaxes(-1, -2)  # [B, F, T]
            im = (mag * jnp.sin(phase)).swapaxes(-1, -2)
            if frame_valid is not None:
                fv = frame_valid[..., 0][:, None, :]  # [B, 1, T]
                re = jnp.where(fv, re, 0.0)  # exp(0)·cos(0) = 1 on pad frames
                im = jnp.where(fv, im, 0.0)
            return istft_real(re, im, self.n_fft, self.hop_length,
                              normalized=False, padding="same", lens=lens)
        # reference stub: interleaved real/imag per bin, normalized ISTFT.
        # length=T·hop keeps the module docstring's contract — the torch
        # default would yield (T-1)·hop and silently truncate a row whose
        # target length equals the bucket
        ri = out.reshape(*out.shape[:-1], n_bins, 2)
        re = ri[..., 0].swapaxes(-1, -2)
        im = ri[..., 1].swapaxes(-1, -2)
        return istft_real(re, im, self.n_fft, self.hop_length,
                          normalized=True, lens=lens,
                          length=out.shape[1] * self.hop_length)


def convert_vocos_state_dict(
    state_dict: Mapping[str, Any], n_layers: int = 8
) -> dict[str, Any]:
    """Official Vocos torch checkpoint → flax params for VocosDecoder.

    Expects keys like backbone.embed.weight, backbone.convnext.{i}.*,
    head.out.weight. Use head_mode="mag_phase", layer_scale=True.
    """

    def _np(v: Any) -> np.ndarray:
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def lin(key: str) -> dict[str, np.ndarray]:
        return {"kernel": _np(state_dict[f"{key}.weight"]).T,
                "bias": _np(state_dict[f"{key}.bias"])}

    def conv(key: str) -> dict[str, np.ndarray]:
        return {"kernel": _np(state_dict[f"{key}.weight"]).transpose(2, 1, 0),
                "bias": _np(state_dict[f"{key}.bias"])}

    def ln(key: str) -> dict[str, np.ndarray]:
        return {"scale": _np(state_dict[f"{key}.weight"]),
                "bias": _np(state_dict[f"{key}.bias"])}

    params: dict[str, Any] = {
        "embed": conv("backbone.embed"),
        "norm_pre": ln("backbone.norm"),
        "norm_post": ln("backbone.final_layer_norm"),
        "head": lin("head.out"),
    }
    for i in range(n_layers):
        b = f"backbone.convnext.{i}"
        block = {
            "dwconv": conv(f"{b}.dwconv"),
            "norm": ln(f"{b}.norm"),
            "pwconv1": lin(f"{b}.pwconv1"),
            "pwconv2": lin(f"{b}.pwconv2"),
        }
        if f"{b}.gamma" in state_dict:
            block["gamma"] = _np(state_dict[f"{b}.gamma"])
        params[f"block{i}"] = block
    return params
