"""Native audiokit (C++) vs the Python mel/normalize implementations."""

import numpy as np
import pytest

from oron_tts_tpu import native
from oron_tts_tpu.ops.mel import MelConfig, log_mel_numpy

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native audiokit not built"
)


def test_log_mel_matches_numpy():
    rng = np.random.default_rng(0)
    cfg = MelConfig()
    for n in [24000, 30000, 5500]:
        audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
        m_nat = native.log_mel(audio, cfg.sample_rate, cfg.n_fft,
                               cfg.hop_length, cfg.win_length, cfg.n_mels)
        m_np = log_mel_numpy(audio, cfg)
        assert m_nat.shape == m_np.shape
        err = np.abs(m_nat - m_np)
        assert err.mean() < 1e-3
        audible = m_np > -9.0
        assert err[audible].max() < 1e-2


def test_normalize_peak_matches_python():
    from oron_tts_tpu.data.wav import normalize_peak

    rng = np.random.default_rng(1)
    audio = (0.3 * rng.standard_normal(1000)).astype(np.float32)
    expected = normalize_peak(audio.copy())
    buf = np.ascontiguousarray(audio)
    assert native.normalize_peak_inplace(buf)
    np.testing.assert_allclose(buf, expected, atol=1e-6)
    # silence guard
    silent = np.zeros(64, np.float32)
    assert native.normalize_peak_inplace(silent)
    assert (silent == 0).all()


def test_dataset_uses_native_or_fallback():
    from oron_tts_tpu.data.dataset import TTSDataset

    t = np.arange(24000) / 24000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ds = TTSDataset(audio_arrays=[audio], texts=["сайн"], sample_rate=24000)
    item = ds[0]
    ref = log_mel_numpy(audio / np.abs(audio).max().clip(1e-8), ds.mel_config)
    assert item["mel"].shape == ref.shape
