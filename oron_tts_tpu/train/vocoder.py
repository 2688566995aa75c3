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
from oron_tts_tpu.ops.mel import (
    MelConfig,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
)


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] → magnitude [B, T, n_freqs] (center=True, hann)."""
    frames = frame_signal(x, n_fft, hop) * jnp.asarray(hann_window(n_fft))
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


def guarded_update(tx, grads, opt_state, params, ok):
    """Non-finite-guarded optimizer update: when ``ok`` is False the grads
    are zeroed through tx.update (so internal counters stay consistent)
    and the pre-update params/opt_state are kept."""
    safe = jax.tree_util.tree_map(
        lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
    )
    updates, new_opt = tx.update(safe, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    pick = functools.partial(
        jax.tree_util.tree_map, lambda a, b: jnp.where(ok, a, b)
    )
    return pick(new_params, params), pick(new_opt, opt_state)


def make_vocoder_train_step(vocoder: Any, tx: optax.GradientTransformation,
                            mel_cfg: MelConfig):
    @jax.jit
    def step(params, opt_state, mel, wav):
        def loss_fn(p):
            return vocoder_loss({"params": p}, vocoder, mel, wav, mel_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params, opt_state = guarded_update(tx, grads, opt_state, params, ok)
        return params, opt_state, loss, gnorm

    return step


def make_vocoder_train_step_wav(
    vocoder: Any, tx: optax.GradientTransformation, mel_cfg: MelConfig
):
    """Waveform-only train step: the input mel is extracted ON DEVICE.

    The original step took a host-computed mel; the numpy matmul-DFT per
    batch dominated wall time (~2 s/step on the tunnel). Device-side mel
    extraction is a few matmuls and rides the MXU; the host only crops.
    """
    from oron_tts_tpu.ops.mel import log_mel_spectrogram

    @jax.jit
    def step(params, opt_state, wav):
        mel = log_mel_spectrogram(wav, mel_cfg)
        crop_t = wav.shape[-1] // mel_cfg.hop_length
        mel = mel[..., :crop_t]

        def loss_fn(p):
            return vocoder_loss({"params": p}, vocoder, mel, wav, mel_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params, opt_state = guarded_update(tx, grads, opt_state, params, ok)
        return params, opt_state, loss, gnorm

    return step


def crop_wavs(
    audios: list[np.ndarray],
    crop_len: int,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Random waveform crops [B, crop_len] (mel happens on device)."""
    rng = rng or np.random.default_rng()
    out = np.zeros((len(audios), crop_len), np.float32)
    for i, audio in enumerate(audios):
        if len(audio) <= crop_len:
            out[i, : len(audio)] = audio
        else:
            start = int(rng.integers(0, len(audio) - crop_len))
            out[i] = audio[start: start + crop_len]
    return out


def pack_corpus(
    audios: list[np.ndarray], crop_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate clips into one flat array for device-resident training.

    Returns (flat [N], clip_offsets [C], max_starts [C]); clips shorter
    than crop_len are zero-padded to it so every clip yields ≥1 valid crop.
    """
    pieces, offsets, max_starts = [], [], []
    pos = 0
    for audio in audios:
        a = audio.astype(np.float32)
        if len(a) < crop_len:
            a = np.pad(a, (0, crop_len - len(a)))
        pieces.append(a)
        offsets.append(pos)
        max_starts.append(len(a) - crop_len)
        pos += len(a)
    if pos >= np.iinfo(np.int32).max:
        # crop starts cross the jit boundary as int32 (x64 is disabled);
        # positions past 2^31 would silently wrap negative and
        # dynamic_slice would clamp them — wrong crops, no error. ~24.8 h
        # of 24 kHz audio; shard the corpus across supersteps instead.
        raise ValueError(
            f"packed vocoder corpus has {pos} samples, which overflows the "
            f"int32 crop indices used on device; split the corpus into "
            f"chunks under {np.iinfo(np.int32).max} samples"
        )
    return (np.concatenate(pieces), np.asarray(offsets, np.int64),
            np.asarray(max_starts, np.int64))


def make_vocoder_superstep(
    vocoder: Any, tx: optax.GradientTransformation, mel_cfg: MelConfig,
    crop_len: int, k_steps: int,
):
    """K train steps per dispatch over a device-resident corpus.

    One jit call receives host-sampled crop start indices [K, B] and runs
    k_steps optimizer updates via lax.scan, cropping waveforms on device
    with dynamic slices — removing both the per-step host→device batch
    upload (the tunnel bottleneck) and the per-step dispatch latency.
    """
    from oron_tts_tpu.ops.mel import log_mel_spectrogram

    @jax.jit
    def superstep(params, opt_state, flat, starts):
        def gather(batch_starts):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(flat, (s,), (crop_len,))
            )(batch_starts)

        def one(carry, batch_starts):
            params, opt_state = carry
            wav = gather(batch_starts)
            mel = log_mel_spectrogram(wav, mel_cfg)[
                ..., : crop_len // mel_cfg.hop_length
            ]

            def loss_fn(p):
                return vocoder_loss({"params": p}, vocoder, mel, wav, mel_cfg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            gnorm = optax.global_norm(grads)
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            params, opt_state = guarded_update(
                tx, grads, opt_state, params, ok
            )
            return (params, opt_state), (loss, gnorm)

        (params, opt_state), (losses, gnorms) = jax.lax.scan(
            one, (params, opt_state), starts
        )
        return params, opt_state, losses, gnorms

    return superstep


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


# ── adversarial stage (optional --gan) ───────────────────────────────────


def lsgan_d_loss(real_logits: list[jnp.ndarray],
                 fake_logits: list[jnp.ndarray]) -> jnp.ndarray:
    """Least-squares discriminator loss: real→1, fake→0."""
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
    return loss / len(real_logits)


def lsgan_g_loss(fake_logits: list[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for f in fake_logits:
        loss = loss + jnp.mean((f - 1.0) ** 2)
    return loss / len(fake_logits)


def feature_matching_loss(real_feats: list[list[jnp.ndarray]],
                          fake_feats: list[list[jnp.ndarray]]) -> jnp.ndarray:
    loss = 0.0
    n = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
            n += 1
    return loss / max(n, 1)


def make_gan_superstep(
    vocoder: Any,
    discriminator: Any,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    mel_cfg: MelConfig,
    crop_len: int,
    k_steps: int,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
    mel_weight: float = 15.0,
):
    """K adversarial (d-step, g-step) pairs per dispatch, device-resident.

    Same dispatch-amortization as make_vocoder_superstep: the host only
    samples crop start indices [K, B]; waveform gathering, mel extraction,
    both optimizer updates, and the non-finite guards run inside one jit.
    Returns step_fn(g_params, g_opt, d_params, d_opt, flat, starts) →
    (g_params, g_opt, d_params, d_opt, metrics[K, 4]) where metrics rows
    are (g_loss, d_loss, mel_l1, g_gnorm).
    """

    _guarded = guarded_update

    @jax.jit
    def superstep(g_params, g_opt, d_params, d_opt, flat, starts):
        def gather(batch_starts):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(flat, (s,), (crop_len,))
            )(batch_starts)

        def one(carry, batch_starts):
            g_params, g_opt, d_params, d_opt = carry
            wav = gather(batch_starts)
            mel = log_mel_spectrogram(wav, mel_cfg)[
                ..., : crop_len // mel_cfg.hop_length
            ]

            # discriminator update on the CURRENT generator's output
            fake = jax.lax.stop_gradient(
                vocoder.apply({"params": g_params}, mel)
            )
            n = min(fake.shape[-1], wav.shape[-1])
            fake_c, real_c = fake[:, :n], wav[:, :n]

            def d_loss_fn(dp):
                real_logits, _ = discriminator.apply({"params": dp}, real_c)
                fake_logits, _ = discriminator.apply({"params": dp}, fake_c)
                return lsgan_d_loss(real_logits, fake_logits)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_gnorm = optax.global_norm(d_grads)
            d_ok = jnp.isfinite(d_loss) & jnp.isfinite(d_gnorm)
            d_params, d_opt = _guarded(d_tx, d_grads, d_opt, d_params, d_ok)

            # generator update against the UPDATED discriminator
            def g_loss_fn(gp):
                out = vocoder.apply({"params": gp}, mel)[:, :n]
                fake_logits, fake_feats = discriminator.apply(
                    {"params": d_params}, out
                )
                _, real_feats = discriminator.apply(
                    {"params": d_params}, real_c
                )
                adv = lsgan_g_loss(fake_logits)
                fm = feature_matching_loss(real_feats, fake_feats)
                stft = multi_resolution_stft_loss(out, real_c)
                mel_l1 = jnp.mean(jnp.abs(
                    log_mel_spectrogram(out, mel_cfg)
                    - log_mel_spectrogram(real_c, mel_cfg)
                ))
                total = (adv_weight * adv + fm_weight * fm + stft
                         + mel_weight * mel_l1)
                return total, mel_l1

            (g_loss, mel_l1), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_params)
            g_gnorm = optax.global_norm(g_grads)
            g_ok = jnp.isfinite(g_loss) & jnp.isfinite(g_gnorm)
            g_params, g_opt = _guarded(g_tx, g_grads, g_opt, g_params, g_ok)

            metrics = jnp.stack([g_loss, d_loss, mel_l1, g_gnorm])
            return (g_params, g_opt, d_params, d_opt), metrics

        carry, metrics = jax.lax.scan(
            one, (g_params, g_opt, d_params, d_opt), starts
        )
        g_params, g_opt, d_params, d_opt = carry
        return g_params, g_opt, d_params, d_opt, metrics

    return superstep


def make_gan_train_steps(
    vocoder: Any,
    discriminator: Any,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    mel_cfg: MelConfig,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
    mel_weight: float = 15.0,
):
    """(generator_step, discriminator_step) — jitted LSGAN updates."""

    @jax.jit
    def d_step(d_params, d_opt, g_params, mel, wav):
        fake = jax.lax.stop_gradient(vocoder.apply({"params": g_params}, mel))
        n = min(fake.shape[-1], wav.shape[-1])

        def loss_fn(dp):
            real_logits, _ = discriminator.apply({"params": dp}, wav[:, :n])
            fake_logits, _ = discriminator.apply({"params": dp}, fake[:, :n])
            return lsgan_d_loss(real_logits, fake_logits)

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, new_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), new_opt, loss

    @jax.jit
    def g_step(g_params, g_opt, d_params, mel, wav):
        def loss_fn(gp):
            fake = vocoder.apply({"params": gp}, mel)
            n = min(fake.shape[-1], wav.shape[-1])
            fake_c, real_c = fake[:, :n], wav[:, :n]
            fake_logits, fake_feats = discriminator.apply(
                {"params": d_params}, fake_c
            )
            _, real_feats = discriminator.apply({"params": d_params}, real_c)
            adv = lsgan_g_loss(fake_logits)
            fm = feature_matching_loss(real_feats, fake_feats)
            stft = multi_resolution_stft_loss(fake_c, real_c)
            mel_l1 = jnp.mean(jnp.abs(
                log_mel_spectrogram(fake_c, mel_cfg)
                - log_mel_spectrogram(real_c, mel_cfg)
            ))
            total = (adv_weight * adv + fm_weight * fm + stft
                     + mel_weight * mel_l1)
            return total, (adv, fm, stft, mel_l1)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, new_opt = g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), new_opt, loss, aux

    return g_step, d_step
