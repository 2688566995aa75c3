"""Real-valued DFT as matmuls — the TPU-native FFT replacement.

The TPU backend (and notably the axon tunnel) has no complex-number support,
and XLA maps dense matmuls straight onto the MXU, so the n_fft=1024 DFT is
expressed as two real basis matmuls instead of an FFT. At TTS scale
(T ≤ ~3k frames) this is a few GFLOP — negligible against the DiT.

Conventions match numpy/torch rfft/irfft: forward X_k = Σ_n x_n e^{-2πikn/N}
(onesided), inverse ignores Im at k=0 and k=N/2 (hermitian assumption).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=8)
def rdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos_basis, sin_basis) each [n_fft, n_freqs]: Re = x@C, Im = x@S."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    return (
        np.cos(angle).astype(np.float32),
        (-np.sin(angle)).astype(np.float32),
    )


@functools.lru_cache(maxsize=8)
def irdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, S) each [n_freqs, n_fft]: frames = Re@C + Im@S  (≡ irfft)."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_freqs)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    weight = np.full((n_freqs, 1), 2.0)
    weight[0] = 1.0
    if n_fft % 2 == 0:
        weight[-1] = 1.0
    C = (weight * np.cos(angle) / n_fft).astype(np.float32)
    S = (-weight * np.sin(angle) / n_fft).astype(np.float32)
    return C, S


def rdft(frames: jnp.ndarray, n_fft: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., n_fft] real frames → (Re, Im) each [..., n_freqs]."""
    C, S = rdft_basis(n_fft)
    re = jnp.matmul(frames, jnp.asarray(C), precision=_HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(S), precision=_HIGHEST)
    return re, im


def rdft_magnitude(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """[..., n_fft] real frames → |rfft| [..., n_freqs]."""
    re, im = rdft(frames, n_fft)
    return jnp.sqrt(re * re + im * im)


def irdft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(Re, Im) [..., n_freqs] → real frames [..., n_fft]  (≡ irfft)."""
    C, S = irdft_basis(n_fft)
    return (
        jnp.matmul(re, jnp.asarray(C), precision=_HIGHEST)
        + jnp.matmul(im, jnp.asarray(S), precision=_HIGHEST)
    )
