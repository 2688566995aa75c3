"""Vocoder training: loss wiring, gradient flow, and a short convergence run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oron_tts_tpu.models.vocos import VocosDecoder
from oron_tts_tpu.ops.mel import MelConfig
from oron_tts_tpu.train.vocoder import (
    crop_batch,
    make_vocoder_train_step,
    multi_resolution_stft_loss,
    vocoder_loss,
)

CFG = MelConfig()


def test_mrstft_loss_zero_for_identical():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8192)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, x)) < 1e-5
    y = jnp.asarray(rng.standard_normal((2, 8192)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, y)) > 0.1


def test_crop_batch_alignment():
    rng = np.random.default_rng(1)
    audios = [rng.standard_normal(24000).astype(np.float32),
              np.zeros(1000, np.float32)]
    mels, wavs = crop_batch(audios, CFG, crop_frames=32, rng=rng)
    assert mels.shape == (2, 100, 32)
    assert wavs.shape == (2, 32 * 256)
    # mel of the crop matches the returned mel
    from oron_tts_tpu.ops.mel import log_mel_numpy

    np.testing.assert_allclose(
        mels[0], log_mel_numpy(wavs[0], CFG)[:, :32], atol=1e-5
    )


def test_vocoder_short_training_reduces_loss():
    vocoder = VocosDecoder(n_mels=100, dim=64, n_layers=2,
                           intermediate_dim=128)
    rng = np.random.default_rng(2)
    sr = 24000
    t = np.arange(sr) / sr
    audios = [
        (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        for f in (220.0, 440.0)
    ]
    mels, wavs = crop_batch(audios, CFG, crop_frames=16, rng=rng)
    variables = vocoder.init(jax.random.PRNGKey(0), mels)
    params = variables["params"]
    tx = optax.adamw(3e-3)
    opt_state = tx.init(params)
    step = make_vocoder_train_step(vocoder, tx, CFG)

    first = float(vocoder_loss({"params": params}, vocoder,
                               jnp.asarray(mels), jnp.asarray(wavs), CFG))
    for i in range(30):
        mels_i, wavs_i = crop_batch(audios, CFG, crop_frames=16, rng=rng)
        params, opt_state, loss, gnorm = step(params, opt_state, mels_i, wavs_i)
        assert np.isfinite(float(loss))
    last = float(vocoder_loss({"params": params}, vocoder,
                              jnp.asarray(mels), jnp.asarray(wavs), CFG))
    assert last < first, (first, last)


def test_vocoder_checkpoint_roundtrip_into_facade(tmp_path):
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.train.checkpoint import CheckpointManager

    vocoder = VocosDecoder(n_mels=100, dim=32, n_layers=1, intermediate_dim=64)
    mel = np.zeros((1, 100, 8), np.float32)
    variables = vocoder.init(jax.random.PRNGKey(0), mel)
    cm = CheckpointManager(tmp_path, model_name="vocos")
    cm.save(10, variables["params"],
            config={"dim": 32, "n_layers": 1, "intermediate_dim": 64,
                    "head_mode": "real_imag"})

    cfg = {"sample_rate": 24000, "n_mels": 100,
           "model": {"dim": 64, "depth": 1, "heads": 2, "text_dim": 16,
                     "conv_layers": 1, "p_dropout": 0.0, "ff_mult": 2}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    model.load_vocoder(cm.latest_checkpoint())
    assert model._vocoder != "griffin_lim"


def test_discriminators_and_gan_steps():
    from oron_tts_tpu.models.discriminators import VocoderDiscriminator
    from oron_tts_tpu.train.vocoder import make_gan_train_steps

    rng = np.random.default_rng(3)
    B, frames = 2, 16
    wav_len = frames * 256
    mels = rng.standard_normal((B, 100, frames)).astype(np.float32) - 8.0
    wavs = (0.3 * rng.standard_normal((B, wav_len))).astype(np.float32)

    vocoder = VocosDecoder(n_mels=100, dim=32, n_layers=1, intermediate_dim=64)
    disc = VocoderDiscriminator(periods=(2, 3), resolutions=((512, 128),),)
    g_params = vocoder.init(jax.random.PRNGKey(0), mels)["params"]
    d_params = disc.init(jax.random.PRNGKey(1), wavs)["params"]

    logits, feats = disc.apply({"params": d_params}, wavs)
    assert len(logits) == 3  # 2 periods + 1 resolution
    assert all(np.isfinite(np.asarray(lg)).all() for lg in logits)

    g_tx = optax.adamw(1e-4)
    d_tx = optax.adamw(1e-4)
    g_step, d_step = make_gan_train_steps(
        vocoder, disc, g_tx, d_tx, CFG
    )
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)

    d_params2, d_opt, d_loss = d_step(d_params, d_opt, g_params, mels, wavs)
    assert np.isfinite(float(d_loss))
    g_params2, g_opt, g_loss, aux = g_step(g_params, g_opt, d_params2,
                                           mels, wavs)
    assert np.isfinite(float(g_loss))
    assert all(np.isfinite(float(a)) for a in aux)
    # parameters actually moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(g_params),
                        jax.tree_util.tree_leaves(g_params2))
    )
    assert moved


def test_gan_superstep_updates_and_guards():
    """make_gan_superstep: K (d,g) pairs per dispatch on a device-resident
    corpus; both param sets move, metrics are [K, 4] and finite."""
    from oron_tts_tpu.models.discriminators import VocoderDiscriminator
    from oron_tts_tpu.train.vocoder import make_gan_superstep

    rng = np.random.default_rng(5)
    crop_len = 8 * CFG.hop_length
    flat = jnp.asarray(
        (0.2 * rng.standard_normal(4 * crop_len)).astype(np.float32)
    )
    vocoder = VocosDecoder(n_mels=100, dim=32, n_layers=1, intermediate_dim=64)
    disc = VocoderDiscriminator(periods=(2,), resolutions=((512, 128),))
    mels0 = rng.standard_normal((2, 100, 8)).astype(np.float32) - 8.0
    g_params = vocoder.init(jax.random.PRNGKey(0), mels0)["params"]
    d_params = disc.init(
        jax.random.PRNGKey(1), np.zeros((2, crop_len), np.float32)
    )["params"]
    g_tx, d_tx = optax.adamw(1e-4), optax.adamw(1e-4)
    step_fn = make_gan_superstep(
        vocoder, disc, g_tx, d_tx, CFG, crop_len, k_steps=2
    )
    starts = np.array([[0, crop_len], [crop_len // 2, 2 * crop_len]], np.int32)
    g2, g_opt, d2, d_opt, metrics = step_fn(
        g_params, g_tx.init(g_params), d_params, d_tx.init(d_params),
        flat, starts,
    )
    m = np.asarray(metrics)
    assert m.shape == (2, 4) and np.isfinite(m).all()
    for before, after in ((g_params, g2), (d_params, d2)):
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(before),
                            jax.tree_util.tree_leaves(after))
        )
