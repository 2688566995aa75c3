"""Vocoder (VocosDecoder) training: mel → waveform reconstruction.

The reference relies on the pretrained charactr/vocos-mel-24khz (f5tts.py:
190-202) and ships no vocoder trainer; in an offline TPU deployment that
checkpoint may be unavailable, so the framework can train its own decoder.
Objective: multi-resolution STFT loss (spectral convergence + log-magnitude
L1, complex-free via ops.dft) + log-mel reconstruction L1 — the standard
non-adversarial recipe (Parallel WaveGAN); a GAN stage can be layered on
later for extra crispness.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oron_tts_tpu.ops.dft import rdft
from oron_tts_tpu.ops.mel import MelConfig, hann_window, log_mel_spectrogram


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] → magnitude [B, T, n_freqs] (center=True, hann)."""
    window = jnp.asarray(hann_window(n_fft))
    pad = n_fft // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + x.shape[-1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = padded[:, idx] * window
    re, im = rdft(frames, n_fft)
    return jnp.sqrt(re * re + im * im + 1e-9)


def multi_resolution_stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    resolutions: tuple[tuple[int, int], ...] = ((512, 128), (1024, 256), (2048, 512)),
) -> jnp.ndarray:
    """Spectral-convergence + log-magnitude L1 summed over resolutions."""
    total = 0.0
    for n_fft, hop in resolutions:
        p = _stft_mag(pred, n_fft, hop)
        t = _stft_mag(target, n_fft, hop)
        sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(p + 1e-7) - jnp.log(t + 1e-7)))
        total = total + sc + mag
    return total / len(resolutions)


def vocoder_loss(
    variables: Any,
    vocoder: Any,
    mel: jnp.ndarray,
    wav_target: jnp.ndarray,
    mel_cfg: MelConfig,
    mel_weight: float = 1.0,
) -> jnp.ndarray:
    """mel [B, n_mels, T], wav_target [B, T*hop]."""
    wav_pred = vocoder.apply(variables, mel)
    n = min(wav_pred.shape[-1], wav_target.shape[-1])
    wav_pred, wav_target = wav_pred[:, :n], wav_target[:, :n]
    loss = multi_resolution_stft_loss(wav_pred, wav_target)
    if mel_weight > 0:
        mel_pred = log_mel_spectrogram(wav_pred, mel_cfg)
        mel_tgt = log_mel_spectrogram(wav_target, mel_cfg)
        loss = loss + mel_weight * jnp.mean(jnp.abs(mel_pred - mel_tgt))
    return loss


def make_vocoder_train_step(vocoder: Any, tx: optax.GradientTransformation,
                            mel_cfg: MelConfig):
    @jax.jit
    def step(params, opt_state, mel, wav):
        def loss_fn(p):
            return vocoder_loss({"params": p}, vocoder, mel, wav, mel_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        safe = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        pick = functools.partial(
            jax.tree_util.tree_map, lambda a, b: jnp.where(ok, a, b)
        )
        return pick(new_params, params), pick(new_opt, opt_state), loss, gnorm

    return step


def crop_batch(
    audios: list[np.ndarray],
    mel_cfg: MelConfig,
    crop_frames: int = 64,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Random aligned (mel, wav) crops: [B, n_mels, crop], [B, crop*hop].

    The mel is computed on the cropped waveform itself so the pair is
    exactly consistent with the framework's center=True mel contract.
    """
    from oron_tts_tpu.ops.mel import log_mel_numpy

    rng = rng or np.random.default_rng()
    hop = mel_cfg.hop_length
    crop_len = crop_frames * hop
    wavs, mels = [], []
    for audio in audios:
        if len(audio) <= crop_len:
            pad = np.zeros(crop_len, np.float32)
            pad[: len(audio)] = audio
            piece = pad
        else:
            start = int(rng.integers(0, len(audio) - crop_len))
            piece = audio[start: start + crop_len]
        wavs.append(piece)
        mels.append(log_mel_numpy(piece, mel_cfg)[:, :crop_frames])
    return np.stack(mels), np.stack(wavs)
