"""Inverse STFT (overlap-add) in JAX for the Vocos-style vocoder head.

Matches torch.istft(center=True, onesided=True) semantics, including the
``normalized=True`` scaling used by the reference decoder
(/root/reference/src/models/decoder.py:94-102). The inverse DFT is computed
as real basis matmuls (ops.dft) — no complex arrays anywhere, since the TPU
backend lacks complex support and matmuls ride the MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.ops.dft import irdft
from oron_tts_tpu.ops.mel import padded_hann_window


@functools.lru_cache(maxsize=8)
def _window(n_fft: int, win_length: int) -> np.ndarray:
    return padded_hann_window(n_fft, win_length)


@functools.lru_cache(maxsize=16)
def _window_envelope(
    n_fft: int, hop_length: int, win_length: int, n_frames: int
) -> np.ndarray:
    """Overlap-added window-square normalization (constant per shape)."""
    w2 = _window(n_fft, win_length).astype(np.float64) ** 2
    out_len = n_fft + hop_length * (n_frames - 1)
    env = np.zeros(out_len)
    for t in range(n_frames):
        env[t * hop_length: t * hop_length + n_fft] += w2
    return env.astype(np.float32)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[..., T, n_fft] → [..., n_fft + hop·(T−1)] without scatter ops.

    TPU scatter-add is serialized and dominated the vocoder's ISTFT cost;
    when hop divides n_fft the overlap-add is R = n_fft/hop statically
    shifted pad+adds (pure vectorized work XLA fuses).
    """
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    out_len = n_fft + hop * (n_frames - 1)
    if n_fft % hop:
        idx = (
            jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
        ).reshape(-1)
        flat = frames.reshape(*frames.shape[:-2], -1)
        wav = jnp.zeros((*frames.shape[:-2], out_len), dtype=frames.dtype)
        return wav.at[..., idx].add(flat)
    r = n_fft // hop
    chunks = frames.reshape(*frames.shape[:-1], r, hop)
    total = n_frames + r - 1
    acc = jnp.zeros((*frames.shape[:-2], total, hop), dtype=frames.dtype)
    pad_spec = [(0, 0)] * (frames.ndim - 2)
    for j in range(r):
        acc = acc + jnp.pad(
            chunks[..., j, :], pad_spec + [(j, r - 1 - j), (0, 0)]
        )
    return acc.reshape(*frames.shape[:-2], total * hop)


def istft_real(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    normalized: bool = False,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
    padding: str = "center",
    lens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Overlap-add inverse STFT from (Re, Im) parts.

    Args:
        re, im: [..., n_freqs, n_frames] onesided spectrum components.
        length: output length; defaults to the torch.istft convention.
        padding: "center" trims n_fft//2 per side (torch.istft); "same"
            trims (n_fft-hop)//2 per side so T frames → T·hop samples
            (official Vocos ISTFTHead convention).
        lens: per-row valid frame counts [...]. When given, the window-
            square normalizer is overlap-added over each row's OWN first
            ``lens`` frames instead of the full padded frame axis — the
            last ~n_fft samples of a row are then identical no matter how
            many pad frames follow it (bucket-invariant batched decode).

    Returns:
        waveform [..., length]
    """
    win_length = win_length or n_fft
    window = jnp.asarray(_window(n_fft, win_length))

    frames = irdft(re.swapaxes(-1, -2), im.swapaxes(-1, -2), n_fft)  # [..., T, n_fft]
    if normalized:
        frames = frames * jnp.sqrt(jnp.asarray(n_fft, dtype=frames.dtype))
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    wav = _overlap_add(frames, hop_length)
    if lens is None:
        wsq = jnp.asarray(
            _window_envelope(n_fft, hop_length, win_length, n_frames)
        )
    else:
        valid = (
            jnp.arange(n_frames) < lens[..., None]
        ).astype(frames.dtype)  # [..., T]
        w2 = (window * window).astype(frames.dtype)
        wsq = _overlap_add(valid[..., None] * w2, hop_length)
    wav = wav / jnp.maximum(wsq, eps)

    if padding == "same":
        pad = (n_fft - hop_length) // 2
    elif center:
        pad = n_fft // 2
    else:
        pad = 0
    if length is None:
        return wav[..., pad: out_len - pad]
    # explicit length: take REAL overlap-add samples past the default trim
    # while they exist (the OLA buffer extends n_fft//2 beyond it) instead
    # of zero-padding — a vocoder asked for T·hop samples from T frames
    # would otherwise splice one hop of digital silence into the audio.
    # (torch.istft zero-pads here; callers needing that exact corner should
    # slice the default-length output themselves.)
    wav = wav[..., pad: min(pad + length, out_len)]
    deficit = length - wav.shape[-1]
    if deficit > 0:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, deficit)])
    return wav


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
    """Complex-input convenience wrapper (CPU parity tests; TPU code should
    call istft_real directly with separate components).

    Inherits istft_real's explicit-length semantics: a ``length`` beyond
    the trimmed default returns REAL overlap-add tail samples where
    torch.istft would zero-pad (see istft_real)."""
    return istft_real(
        jnp.real(spec), jnp.imag(spec), n_fft, hop_length, win_length,
        normalized=normalized, center=center, length=length, eps=eps,
    )
