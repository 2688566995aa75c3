"""Vocoder discriminators: multi-period (MPD) + multi-resolution (MRD).

The HiFi-GAN/Vocos adversarial recipe, in flax for the optional GAN stage of
vocoder training (scripts/train_vocoder.py --gan). Least-squares GAN losses
and feature matching live in train/vocoder.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from oron_tts_tpu.ops.dft import rdft


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.1)


class PeriodDiscriminator(nn.Module):
    """Reshapes the waveform into [T/p, p] frames and applies 2-D convs."""

    period: int
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        """wav [B, T] → (logits [B, N], feature maps)."""
        B, T = wav.shape
        pad = (-T) % self.period
        # reflect needs pad <= T-1; segments shorter than the period can
        # require up to period-1 pad samples
        mode = "reflect" if pad < T else "constant"
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode=mode)
        x = x.reshape(B, -1, self.period, 1)  # [B, T/p, p, 1]

        features: list[jnp.ndarray] = []
        for i, ch in enumerate(self.channels):
            x = nn.Conv(
                ch, kernel_size=(5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = _leaky(x)
            features.append(x)
        x = nn.Conv(
            1024, kernel_size=(5, 1), padding=((2, 2), (0, 0)),
            dtype=self.dtype, name="conv_post1",
        )(x)
        x = _leaky(x)
        features.append(x)
        x = nn.Conv(
            1, kernel_size=(3, 1), padding=((1, 1), (0, 0)),
            dtype=self.dtype, name="conv_post2",
        )(x)
        return x.reshape(B, -1), features


class ResolutionDiscriminator(nn.Module):
    """2-D convs over the magnitude spectrogram at one STFT resolution."""

    n_fft: int
    hop: int
    channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        from oron_tts_tpu.ops.mel import frame_signal, hann_window

        B = wav.shape[0]
        window = jnp.asarray(hann_window(self.n_fft)).astype(wav.dtype)
        frames = frame_signal(wav, self.n_fft, self.hop) * window
        re, im = rdft(frames, self.n_fft)
        mag = jnp.sqrt(re * re + im * im + 1e-9)  # [B, T', F]
        x = mag[..., None]

        features: list[jnp.ndarray] = []
        specs = [((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                 ((3, 9), (1, 2)), ((3, 3), (1, 1))]
        for i, (k, s) in enumerate(specs):
            x = nn.Conv(self.channels, kernel_size=k, strides=s, padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = _leaky(x)
            features.append(x)
        x = nn.Conv(1, kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_post")(x)
        return x.reshape(B, -1), features


class VocoderDiscriminator(nn.Module):
    """Bundle: MPD over (2,3,5,7,11) + MRD over three resolutions."""

    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    resolutions: tuple[tuple[int, int], ...] = ((512, 128), (1024, 256), (2048, 512))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, wav: jnp.ndarray
    ) -> tuple[list[jnp.ndarray], list[list[jnp.ndarray]]]:
        logits: list[jnp.ndarray] = []
        features: list[list[jnp.ndarray]] = []
        for p in self.periods:
            lg, fm = PeriodDiscriminator(p, dtype=self.dtype, name=f"mpd_{p}")(wav)
            logits.append(lg)
            features.append(fm)
        for n_fft, hop in self.resolutions:
            lg, fm = ResolutionDiscriminator(
                n_fft, hop, dtype=self.dtype, name=f"mrd_{n_fft}"
            )(wav)
            logits.append(lg)
            features.append(fm)
        return logits, features
