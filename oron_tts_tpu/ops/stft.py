"""Inverse STFT (overlap-add) in JAX for the Vocos-style vocoder head.

Matches torch.istft(center=True, onesided=True) semantics, including the
``normalized=True`` scaling used by the reference decoder
(/root/reference/src/models/decoder.py:94-102): for a normalized-STFT input
each frame's inverse is scaled by sqrt(n_fft) before windowing.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.ops.mel import hann_window


@functools.lru_cache(maxsize=8)
def _window(n_fft: int, win_length: int) -> np.ndarray:
    w = np.zeros(n_fft, dtype=np.float32)
    offset = (n_fft - win_length) // 2
    w[offset: offset + win_length] = hann_window(win_length)
    return w


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    normalized: bool = False,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
) -> jnp.ndarray:
    """Overlap-add inverse STFT.

    Args:
        spec: complex spectrogram [..., n_freqs, n_frames] (onesided).
        length: output length; defaults to n_frames*hop - n_fft + hop when
            center else (n_frames-1)*hop + n_fft.

    Returns:
        waveform [..., length]
    """
    win_length = win_length or n_fft
    window = jnp.asarray(_window(n_fft, win_length))

    frames = jnp.fft.irfft(spec.swapaxes(-1, -2), n=n_fft, axis=-1)  # [..., T, n_fft]
    if normalized:
        frames = frames * jnp.sqrt(jnp.asarray(n_fft, dtype=frames.dtype))
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via scatter over frame offsets.
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    ).reshape(-1)
    flat = frames.reshape(*frames.shape[:-2], -1)
    wav = jnp.zeros((*frames.shape[:-2], out_len), dtype=frames.dtype)
    wav = wav.at[..., idx].add(flat)

    # Window-envelope normalization (sum of squared windows per sample).
    wsq = jnp.zeros(out_len, dtype=frames.dtype)
    wsq = wsq.at[idx].add(jnp.tile(window * window, n_frames))
    wav = wav / jnp.maximum(wsq, eps)

    if center:
        pad = n_fft // 2
        wav = wav[..., pad: out_len - pad]
    if length is not None:
        wav = wav[..., :length]
        deficit = length - wav.shape[-1]
        if deficit > 0:
            wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, deficit)])
    return wav
