"""Griffin-Lim mel→waveform fallback (no learned weights required).

Used when no trained vocoder checkpoint is available: inverts the log-mel
via the filterbank pseudo-inverse, then recovers phase iteratively. All
spectral transforms are real-matmul DFTs (ops.dft) — complex-free so the
loop runs on TPU as MXU matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.ops.dft import rdft
from oron_tts_tpu.ops.mel import (
    MelConfig,
    frame_signal,
    hann_window,
    mel_filterbank,
)
from oron_tts_tpu.ops.stft import istft_real


@functools.lru_cache(maxsize=4)
def _pinv_fb(cfg: MelConfig) -> np.ndarray:
    # fb is [n_freqs, n_mels]; mel = fb.T @ mag, so mag ≈ pinv(fb).T @ mel
    return np.linalg.pinv(mel_filterbank(cfg)).astype(np.float32)  # [n_mels, n_freqs]


def mel_to_linear(log_mel: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[..., n_mels, T] log-mel → [..., n_freqs, T] magnitude estimate."""
    mel = jnp.exp(log_mel)
    pinv = jnp.asarray(_pinv_fb(cfg))  # [n_mels, n_freqs]
    mag = jnp.einsum("mf,...mt->...ft", pinv, mel)
    return jnp.maximum(mag, 0.0)


def _stft_re_im(audio: jnp.ndarray, cfg: MelConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    window = jnp.asarray(hann_window(cfg.win_length))
    frames = frame_signal(audio, cfg.n_fft, cfg.hop_length) * window
    re, im = rdft(frames, cfg.n_fft)
    return re.swapaxes(-1, -2), im.swapaxes(-1, -2)  # [..., F, T]


def griffin_lim(
    log_mel: jnp.ndarray,
    cfg: MelConfig,
    n_iter: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """[..., n_mels, T] log-mel → waveform [..., T*hop]."""
    mag = mel_to_linear(log_mel, cfg)  # [..., F, T]
    t_frames = mag.shape[-1]
    length = (t_frames - 1) * cfg.hop_length

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)

    def body(_, carry):
        re, im = carry
        wav = istft_real(re, im, cfg.n_fft, cfg.hop_length, cfg.win_length,
                         length=length)
        new_re, new_im = _stft_re_im(wav, cfg)
        new_re, new_im = new_re[..., :t_frames], new_im[..., :t_frames]
        norm = jnp.maximum(jnp.sqrt(new_re**2 + new_im**2), 1e-8)
        return mag * new_re / norm, mag * new_im / norm

    re, im = jax.lax.fori_loop(0, n_iter, body, (re, im))
    # final render at the framework's T·hop contract (the torch-center
    # (T-1)·hop convention would leave callers' last hop samples as
    # spliced-in silence); the iteration above stays at (T-1)·hop so each
    # re-STFT reproduces exactly t_frames frames
    return istft_real(re, im, cfg.n_fft, cfg.hop_length, cfg.win_length,
                      length=t_frames * cfg.hop_length)
