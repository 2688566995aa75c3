"""Fused Pallas mel kernel vs the numpy/XLA reference (interpret mode)."""

import numpy as np

from oron_tts_tpu.ops.mel import MelConfig, log_mel_numpy
from oron_tts_tpu.ops.pallas_mel import log_mel_pallas

CFG = MelConfig()


def test_matches_reference_lengths():
    rng = np.random.default_rng(0)
    for n in [24000, 30001, 4096, 256 * 300]:
        audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
        mel_p = np.asarray(log_mel_pallas(audio, CFG, interpret=True))
        mel_n = log_mel_numpy(audio, CFG)
        assert mel_p.shape == mel_n.shape == (100, 1 + n // 256)
        np.testing.assert_allclose(mel_p, mel_n, atol=1e-4)


def test_block_sizes():
    rng = np.random.default_rng(1)
    audio = (0.3 * rng.standard_normal(24000)).astype(np.float32)
    ref = np.asarray(log_mel_pallas(audio, CFG, interpret=True))
    for bt in [64, 128, 512]:
        out = np.asarray(log_mel_pallas(audio, CFG, block_t=bt, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_silence_hits_floor():
    mel = np.asarray(log_mel_pallas(np.zeros(8192, np.float32), CFG,
                                    interpret=True))
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-5)
