"""Tests for the JAX DSP layer: STFT/mel parity with torch, ISTFT, WAV I/O."""

import numpy as np
import pytest

from oron_tts_tpu.data import wav as wavio
from oron_tts_tpu.ops.mel import (
    MelConfig,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)

torch = pytest.importorskip("torch")

CFG = MelConfig()


def _sine(sr=24000, f=220.0, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_hann_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_stft_magnitude_matches_torch():
    audio = _sine(dur=0.73)
    ours = np.asarray(stft_magnitude(audio, CFG))
    ref = torch.stft(
        torch.from_numpy(audio),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_frame_count_contract():
    # center=True → 1 + L // hop frames
    for n in [24000, 24001, 25599, 4096]:
        audio = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        frames = frame_signal(audio, CFG.n_fft, CFG.hop_length)
        assert frames.shape == (1 + n // CFG.hop_length, CFG.n_fft)


def test_mel_filterbank_invariants():
    fb = mel_filterbank(CFG)
    assert fb.shape == (513, 100)
    assert (fb >= 0).all()
    # each filter is nonzero and unimodal-ish; filters cover the band
    assert (fb.sum(axis=0) > 0).all()
    # triangle peaks increase in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # HTK scale: first filter peak near mel-spaced center, not at DC
    assert peaks[0] > 0


def test_mel_filterbank_matches_torch_formula():
    # independent recomputation with torch ops following the documented
    # melscale_fbanks(norm=None, mel_scale="htk") algorithm
    n_freqs, n_mels, sr = CFG.n_freqs, CFG.n_mels, CFG.sample_rate
    all_freqs = torch.linspace(0, sr // 2, n_freqs, dtype=torch.float64)
    m_min = 2595.0 * torch.log10(torch.tensor(1.0, dtype=torch.float64))
    m_max = 2595.0 * torch.log10(torch.tensor(1 + (sr / 2) / 700.0, dtype=torch.float64))
    m_pts = torch.linspace(m_min.item(), m_max.item(), n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    ref_fb = torch.clamp(torch.min(down, up), min=0.0).numpy()
    np.testing.assert_allclose(mel_filterbank(CFG), ref_fb, atol=1e-5)


def test_log_mel_shape_and_finiteness():
    audio = _sine(dur=2.0)
    mel = np.asarray(log_mel_spectrogram(audio, CFG))
    assert mel.shape == (100, 1 + len(audio) // 256)
    assert np.isfinite(mel).all()
    # floor respected
    assert mel.min() >= np.log(1e-5) - 1e-4
    # a 220 Hz tone concentrates energy in the lowest mel bands
    band_energy = mel.mean(axis=1)
    assert band_energy[:10].max() > band_energy[50:].max()


def test_log_mel_batched_matches_single():
    rng = np.random.default_rng(1)
    batch = rng.standard_normal((3, 12000)).astype(np.float32)
    stacked = np.asarray(log_mel_spectrogram(batch, CFG))
    for i in range(3):
        single = np.asarray(log_mel_spectrogram(batch[i], CFG))
        np.testing.assert_allclose(stacked[i], single, atol=1e-5)


def test_istft_roundtrip_matches_torch():
    from oron_tts_tpu.ops.stft import istft

    rng = np.random.default_rng(2)
    audio = rng.standard_normal(8192).astype(np.float32) * 0.3
    window = torch.hann_window(1024)
    spec_t = torch.stft(
        torch.from_numpy(audio), n_fft=1024, hop_length=256,
        window=window, center=True, return_complex=True, normalized=True,
    )
    # torch roundtrip as ground truth
    ref = torch.istft(
        spec_t, n_fft=1024, hop_length=256, win_length=1024,
        window=window, normalized=True, onesided=True,
    ).numpy()
    ours = np.asarray(
        istft(np.asarray(spec_t.numpy()), 1024, 256, 1024,
              normalized=True, length=len(ref))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    np.testing.assert_allclose(ours, audio[: len(ours)], atol=1e-4)


def test_wav_roundtrip():
    import tempfile
    from pathlib import Path

    audio = _sine(dur=0.25)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "x.wav"
        wavio.write_wav(p, audio, 24000, subtype="pcm16")
        back, sr = wavio.read_wav(p)
        assert sr == 24000
        np.testing.assert_allclose(back, audio, atol=1.0 / 32000)

        wavio.write_wav(p, audio, 24000, subtype="float32")
        back, sr = wavio.read_wav(p)
        np.testing.assert_allclose(back, audio, atol=1e-7)

        dur, sr = wavio.wav_info_bytes(p.read_bytes())
        assert sr == 24000 and abs(dur - 0.25) < 1e-6


def test_wav_stereo_and_24bit():
    # stereo float32 write/read
    import tempfile
    from pathlib import Path

    stereo = np.stack([_sine(f=220, dur=0.1), _sine(f=440, dur=0.1)], axis=1)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "s.wav"
        wavio.write_wav(p, stereo, 24000, subtype="float32")
        back, sr = wavio.read_wav(p)
        assert back.shape == stereo.shape
        np.testing.assert_allclose(back, stereo, atol=1e-7)


def test_resample_preserves_tone():
    audio = _sine(sr=16000, f=440.0, dur=0.5)
    out = wavio.resample(audio, 16000, 24000)
    assert abs(len(out) - 12000) <= 2  # 0.5 s at 24 kHz
    # dominant frequency still ~440 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = spec.argmax() * 24000 / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_trim_silence():
    sr = 24000
    silence = np.zeros(sr // 2, dtype=np.float32)
    tone = _sine(dur=0.5)
    padded = np.concatenate([silence, tone, silence])
    trimmed = wavio.trim_silence(padded)
    assert len(trimmed) < len(padded)
    assert len(trimmed) >= len(tone) - 4096


def test_normalize_peak_guard():
    assert wavio.normalize_peak(np.zeros(10, np.float32)).max() == 0.0
    out = wavio.normalize_peak(np.array([0.1, -0.5], np.float32))
    assert abs(out).max() <= 1.0
    assert abs(abs(out).max() - 1.0) < 1e-5
