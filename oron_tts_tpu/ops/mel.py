"""Log-mel spectrogram in pure JAX, numerically matching the reference contract.

The reference uses torchaudio's ``MelSpectrogram(power=1, center=True)`` plus
``log(clamp(x, 1e-5))`` (reference src/utils/audio.py:50-58,94-110), i.e. the
exact feature extraction of the pretrained Vocos vocoder:

- reflect-pad by n_fft//2 on both sides (center=True)
- periodic Hann window, hop 256, win 1024 = n_fft
- onesided rFFT, magnitude (power=1)
- HTK-scale mel filterbank, f_min=0, f_max=sr/2, no norm (torchaudio defaults)
- natural log with a 1e-5 floor

Everything here is shape-static and jit/vmap friendly; the filterbank and
window are precomputed host-side once per config.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 100
    f_min: float = 0.0
    f_max: float | None = None  # defaults to sample_rate / 2
    log_clip: float = 1e-5

    @property
    def fmax(self) -> float:
        return self.sample_rate / 2 if self.f_max is None else self.f_max

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic form matches torch.hann_window defaults."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def padded_hann_window(n_fft: int, win_length: int) -> np.ndarray:
    """Hann window zero-padded and centered to n_fft (the torch.stft
    convention when win_length < n_fft). THE window used by every STFT/
    ISTFT/mel path in the framework — keep the convention in one place."""
    w = np.zeros(n_fft, dtype=np.float32)
    offset = (n_fft - win_length) // 2
    w[offset: offset + win_length] = hann_window(win_length)
    return w


def _hz_to_mel_htk(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """Triangular HTK mel filterbank [n_freqs, n_mels], torchaudio-compatible.

    Mirrors torchaudio.functional.melscale_fbanks(norm=None, mel_scale="htk"):
    FFT bin centers are linspace(0, sample_rate // 2, n_freqs).
    """
    all_freqs = np.linspace(0, cfg.sample_rate // 2, cfg.n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_htk(cfg.f_min), _hz_to_mel_htk(cfg.fmax), cfg.n_mels + 2
    )
    f_pts = _mel_to_hz_htk(mel_pts)
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _constants(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    # NOTE: cache host numpy arrays, never jnp arrays — a jnp constant created
    # during a jit trace would be memoized as a leaked tracer.
    return padded_hann_window(cfg.n_fft, cfg.win_length), mel_filterbank(cfg)


def frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-pad (reflect) and slice into overlapping frames.

    audio: [..., L] → frames [..., 1 + L // hop, n_fft].
    """
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
    padded = jnp.pad(audio, pad_widths, mode="reflect")
    n_frames = 1 + audio.shape[-1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return padded[..., idx]


def stft_magnitude(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Magnitude spectrogram [..., n_freqs, n_frames] (power=1, center=True).

    Uses the real-matmul DFT (ops.dft) — TPU has no complex support and the
    basis matmul maps straight onto the MXU.
    """
    from oron_tts_tpu.ops.dft import rdft_magnitude

    window, _ = _constants(cfg)
    frames = frame_signal(audio.astype(jnp.float32), cfg.n_fft, cfg.hop_length)
    mag = rdft_magnitude(frames * window, cfg.n_fft)  # [..., T, F]
    return mag.swapaxes(-1, -2)


def log_mel_spectrogram(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Log-mel features [..., n_mels, n_frames] matching the Vocos contract."""
    _, fb = _constants(cfg)
    mag = stft_magnitude(audio, cfg)  # [..., F, T]
    # HIGHEST precision: default bf16 MXU passes visibly perturb log-mels
    mel = jnp.einsum(
        "...ft,fm->...mt", mag, fb, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.log(jnp.clip(mel, min=cfg.log_clip))


@functools.partial(jax.jit, static_argnums=(1,))
def log_mel_spectrogram_jit(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    return log_mel_spectrogram(audio, cfg)


def log_mel_numpy(audio: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Host-side (numpy) log-mel, bit-comparable with the JAX path.

    Used by dataloader workers so feature extraction overlaps TPU compute
    without staging raw audio through the device.
    """
    window, fb = _constants(cfg)
    audio = np.asarray(audio, dtype=np.float32)
    pad = cfg.n_fft // 2
    padded = np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + audio.shape[-1] // cfg.hop_length
    idx = (
        np.arange(n_frames)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
    )
    frames = padded[..., idx] * window
    mag = np.abs(np.fft.rfft(frames, axis=-1)).swapaxes(-1, -2)
    mel = np.einsum("...ft,fm->...mt", mag, fb)
    return np.log(np.clip(mel, cfg.log_clip, None)).astype(np.float32)
