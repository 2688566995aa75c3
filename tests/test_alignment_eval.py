"""Tone-code alignment eval protocol (oron_tts_tpu/evals/alignment.py).

The encode→decode loop must be lossless BEFORE any model enters the
picture: the protocol's CER is only meaningful as a model metric if the
rendering and inversion are exact inverses on the tone corpus itself.
"""

import numpy as np
import pytest

from oron_tts_tpu.evals.alignment import (
    LETTERS,
    char_error_rate,
    decode_logmel,
    decode_waveform,
    expected_letters,
    letter_bins,
    letter_frequencies,
    render_text,
)
from oron_tts_tpu.ops.mel import MelConfig, log_mel_numpy

SENTENCES = [
    "сайн байна уу",
    "монгол улс",
    "өнөөдөр сайхан өдөр байна",
    "бүх хүн төрөлхөөс эрх чөлөөтэй",
    "уул усаа хайрла",  # repeated letters must stay distinct
]


def test_roundtrip_is_lossless():
    for text in SENTENCES:
        ref = expected_letters(text)
        hyp = decode_waveform(render_text(text))
        assert hyp == ref, f"{text!r}: {hyp!r} != {ref!r}"


def test_full_alphabet_roundtrip():
    text = " ".join(LETTERS)
    ref = expected_letters(text)
    assert len(ref) == 35
    assert decode_waveform(render_text(text)) == ref


def test_decode_logmel_is_the_waveform_path():
    wav = render_text(SENTENCES[0])
    logmel = log_mel_numpy(wav, MelConfig())
    assert decode_logmel(logmel) == decode_waveform(wav)


def test_letter_bins_are_separable():
    bins = list(letter_bins().values())
    assert bins == sorted(bins)
    assert min(np.diff(bins)) >= 2  # argmax never lands between letters
    assert max(bins) < MelConfig().n_mels


def test_letter_frequencies_fit_band():
    freqs = letter_frequencies()
    vals = list(freqs.values())
    assert vals == sorted(vals)
    assert vals[0] > 80.0
    assert vals[-1] < MelConfig().sample_rate / 2


def test_cer_metric():
    assert char_error_rate("абв", "абв") == 0.0
    assert char_error_rate("абв", "аб") == pytest.approx(1 / 3)
    assert char_error_rate("абв", "") == 1.0
    assert char_error_rate("аб", "ба") == 1.0  # two substitutions
    with pytest.raises(ValueError):
        char_error_rate("", "аб")


def test_duration_rule_matches_facade_heuristic():
    # render length must equal the facade's ref-free duration estimate so
    # inference-time durations land in-distribution (13 frames/char)
    text = "сайн байна"
    wav = render_text(text)
    from oron_tts_tpu.text.cleaner import TextCleaner

    cleaned = TextCleaner().clean(text, "mn")
    assert len(wav) == len(cleaned) * 13 * 256


def test_synthesize_mel_shape_and_untrained_cer():
    """synthesize_mel returns [n_mels, T]; an untrained model scores ~1 CER
    (the protocol actually discriminates trained from untrained)."""
    from oron_tts_tpu.models.f5tts import F5TTS

    tiny = {
        "sample_rate": 24000, "n_fft": 1024, "hop_length": 256,
        "n_mels": 100,
        "model": {
            "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2,
            "ff_mult": 2, "text_dim": 32, "conv_layers": 2,
            "p_dropout": 0.0,
        },
    }
    model = F5TTS.from_config(tiny)
    model.init_params(0)
    text = "сайн байна уу"
    mel = model.synthesize_mel(text, n_steps=2, seed=0)
    ref = expected_letters(text)
    assert mel.ndim == 2 and mel.shape[0] == 100 and mel.shape[1] > 0
    cer = char_error_rate(ref, decode_logmel(mel))
    assert cer > 0.5  # random-weights output must not accidentally "pass"


def test_build_corpus_contract():
    """Corpus generator: deterministic in seed, every clip >= the dataset's
    1.0s filter, all 35 letters covered, decode roundtrip lossless."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from make_tone_corpus import build_corpus

    texts, wavs = build_corpus(40, seed=7)
    texts2, _ = build_corpus(40, seed=7)
    assert texts == texts2
    assert len(texts) == len(wavs) == 40
    sr = 24000
    assert all(len(w) / sr >= 1.0 for w in wavs)
    assert set("".join(texts)) - {" "} == set(LETTERS)
    for t, w in zip(texts[:3], wavs[:3]):
        assert decode_waveform(w) == expected_letters(t)
