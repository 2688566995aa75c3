"""Coverage for modules without dedicated tests: Griffin-Lim, threaded
loader, mesh helpers, env utils, denoiser."""

import numpy as np

from oron_tts_tpu.ops.mel import MelConfig, log_mel_numpy


def test_griffin_lim_reconstructs_tone():
    from oron_tts_tpu.ops.griffin_lim import griffin_lim

    sr = 24000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    cfg = MelConfig()
    mel = log_mel_numpy(tone, cfg)
    wav = np.asarray(griffin_lim(mel, cfg, n_iter=16))
    assert np.isfinite(wav).all()
    # dominant frequency of the reconstruction stays at ~440 Hz
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    peak_hz = spec.argmax() * sr / len(wav)
    assert abs(peak_hz - 440.0) < 15.0


def test_threaded_loader_matches_serial():
    from oron_tts_tpu.data.dataset import FixedBatchSampler, TTSCollator, TTSDataset
    from oron_tts_tpu.data.loader import DataLoader

    rng = np.random.default_rng(0)
    arrays = [(0.3 * rng.standard_normal(24000)).astype(np.float32)
              for _ in range(6)]
    ds = TTSDataset(audio_arrays=arrays, texts=["нэг хоёр"] * 6)
    collator = TTSCollator(pad_to_multiple=64)

    def batches(workers):
        sampler = FixedBatchSampler(6, 2, shuffle=False, drop_last=False)
        return list(DataLoader(ds, sampler, collator, num_workers=workers))

    serial = batches(0)
    threaded = batches(3)
    assert len(serial) == len(threaded) == 3
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["mel"], b["mel"])
        np.testing.assert_array_equal(a["text_ids"], b["text_ids"])


def test_loader_skips_failing_samples():
    from oron_tts_tpu.data.dataset import FixedBatchSampler, TTSCollator, TTSDataset
    from oron_tts_tpu.data.loader import DataLoader

    rng = np.random.default_rng(1)
    arrays = [(0.3 * rng.standard_normal(24000)).astype(np.float32),
              np.full(24000, np.nan, dtype=np.float32)]  # poisoned sample
    ds = TTSDataset(audio_arrays=arrays, texts=["нэг", "хоёр"])
    loader = DataLoader(
        ds, FixedBatchSampler(2, 1, shuffle=False, drop_last=False),
        TTSCollator(pad_to_multiple=64), num_workers=0,
    )
    out = list(loader)
    assert len(out) == 1  # the NaN sample's batch vanished, not the run


def test_shard_dataset_indices():
    from oron_tts_tpu.parallel.mesh import shard_dataset_indices

    idx = shard_dataset_indices(10)
    assert idx == list(range(10))  # single-process


def test_env_loader(tmp_path):
    import os

    from oron_tts_tpu.utils.env import load_dotenv, resolve_hf_token

    env = tmp_path / ".env"
    env.write_text("# comment\nORON_TEST_TOKEN='secret'\nBROKENLINE\n")
    try:
        assert load_dotenv(env)
        assert os.environ.get("ORON_TEST_TOKEN") == "secret"
        assert not load_dotenv(tmp_path / "missing.env")
        assert resolve_hf_token("explicit") == "explicit"
    finally:
        # a mid-test failure must not leak the var into later tests
        os.environ.pop("ORON_TEST_TOKEN", None)


def test_spectral_gate_reduces_noise():
    from oron_tts_tpu.data.denoiser import AudioDenoiser, spectral_gate

    rng = np.random.default_rng(2)
    sr = 24000
    t = np.arange(sr) / sr
    # speech-like: modulated tone with silent (noise-only) regions
    envelope = np.clip(np.sin(2 * np.pi * 2.0 * t), 0, None)
    clean = 0.5 * np.sin(2 * np.pi * 300 * t) * envelope
    noisy = (clean + 0.03 * rng.standard_normal(sr)).astype(np.float32)
    out = spectral_gate(noisy, sr)
    assert out.shape == noisy.shape

    def snr(x):
        residual = x[: len(clean)] - clean
        return 10 * np.log10(clean.var() / max(residual.var(), 1e-12))

    assert snr(out) > snr(noisy) + 3.0, (snr(noisy), snr(out))

    den = AudioDenoiser(target_sample_rate=sr, backend="spectral")
    out2 = den.denoise(noisy, sr)
    assert np.isfinite(out2).all()
    assert abs(len(out2) - len(noisy)) < 64  # 48k round-trip keeps length


def test_grouped_conv1d_matches_xla_grouped_conv():
    """GroupedConv1d (shifted grouped matmuls) == nn.Conv with
    feature_group_count, same param layout (layers.py:GroupedConv1d)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.models.layers import GroupedConv1d

    C, G, K = 64, 16, 31
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, C))
    ref = nn.Conv(C, kernel_size=(K,), padding="SAME", feature_group_count=G)
    mine = GroupedConv1d(C, kernel_size=K, groups=G)
    v = ref.init(jax.random.PRNGKey(1), x)
    v = jax.tree_util.tree_map(lambda a: a + 0.05, v)  # non-zero bias
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        mine.init(jax.random.PRNGKey(2), x)
    )
    diff = jnp.abs(ref.apply(v, x) - mine.apply(v, x)).max()
    assert float(diff) < 1e-5


def test_grouped_conv_pallas_matches_ref_and_grads():
    """ops/grouped_conv: Pallas forward (interpret) + custom-VJP grads
    match the XLA reference (grouped conv + bias + Mish)."""
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.ops.grouped_conv import (
        _conv_mish_ref,
        grouped_conv1d_pallas,
    )

    C, G, K = 256, 4, 7
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 24, C))
    kern = jax.random.normal(jax.random.PRNGKey(1), (K, C // G, C)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1

    y = grouped_conv1d_pallas(x, kern, bias, G, True, True)
    y_ref = _conv_mish_ref(x, kern, bias, G, True)
    assert float(jnp.abs(y - y_ref).max()) < 1e-5

    gp = jax.grad(
        lambda *a: jnp.sum(grouped_conv1d_pallas(*a, G, True, True) ** 2),
        argnums=(0, 1, 2),
    )(x, kern, bias)
    gr = jax.grad(
        lambda *a: jnp.sum(_conv_mish_ref(*a, G, True) ** 2),
        argnums=(0, 1, 2),
    )(x, kern, bias)
    for a, b in zip(gp, gr):
        assert float(jnp.abs(a - b).max()) < 1e-4
