"""Calibrated ref-free duration (data/duration_stats.py) and its facade
integration (the added rung in F5TTS._target_len's cascade)."""

import numpy as np
import pytest

from oron_tts_tpu.data.duration_stats import (
    REFERENCE_FPC,
    estimate_frames,
    fit_duration_table,
    stats_from_texts,
)


def _synthetic_corpus(rng, n=200, vocab=65):
    """Clips whose frame count is an exact per-token linear function."""
    true_fpc = np.clip(rng.normal(13.0, 3.0, vocab), 4, 30)
    id_seqs, frames = [], []
    for _ in range(n):
        ids = rng.integers(11, vocab, size=rng.integers(10, 60)).tolist()
        id_seqs.append(ids)
        frames.append(float(sum(true_fpc[t] for t in ids)))
    return true_fpc, id_seqs, frames


def test_fit_recovers_linear_model():
    rng = np.random.default_rng(0)
    true_fpc, id_seqs, frames = _synthetic_corpus(rng)
    stats = fit_duration_table(id_seqs, frames)
    pred = [estimate_frames(ids, stats) for ids in id_seqs]
    rel = [abs(p - f) / f for p, f in zip(pred, frames)]
    assert float(np.mean(rel)) < 0.03  # ridge + int floor keep ~exact


def test_rare_tokens_fall_back_to_global():
    ids = [[12, 13]] * 50 + [[14]]  # token 14 appears once (< min_count)
    frames = [26.0] * 50 + [13.0]
    stats = fit_duration_table(ids, frames, min_count=5)
    assert stats["fpc"][14] == stats["global"]


def test_estimate_respects_floor_and_speed():
    stats = {"fpc": [10.0] * 65, "global": 10.0}
    assert estimate_frames([1, 2], stats) == 50  # 20 frames -> floor 50
    long = list(range(11, 31)) * 2  # 40 tokens -> 400 frames
    assert estimate_frames(long, stats) == 400
    assert estimate_frames(long, stats, speed=2.0) == 200


def test_estimate_none_without_stats():
    assert estimate_frames([1, 2, 3], None) is None
    assert estimate_frames([1, 2, 3], {"fpc": []}) is None


def test_stats_from_texts_tone_corpus_counts_spaces():
    """On a corpus where every cleaned char (spaces included) costs 13
    frames, the fitted table must predict near-truth, beating the
    reference's nonspace*13 by the corpus' space fraction."""
    rng = np.random.default_rng(1)
    words = ["сайн", "байна", "уу", "таван", "морь"]
    texts, durs = [], []
    for _ in range(64):
        t = " ".join(rng.choice(words, size=int(rng.integers(3, 9))))
        texts.append(t)
        durs.append(len(t) * 13 * 256 / 24000)  # true: ALL chars
    stats = stats_from_texts(texts, "mn", durs, 24000, 256)
    assert stats is not None
    from oron_tts_tpu.text.cleaner import TextCleaner

    cleaner = TextCleaner()
    errs, ref_errs = [], []
    for t, d in zip(texts, durs):
        truth = d * 24000 / 256
        ids = cleaner.text_to_sequence(t, lang="mn")
        errs.append(abs(estimate_frames(ids, stats) - truth) / truth)
        ref = max(50, int(len(t.replace(" ", "")) * REFERENCE_FPC))
        ref_errs.append(abs(ref - truth) / truth)
    assert float(np.mean(errs)) < 0.02
    assert float(np.mean(errs)) < float(np.mean(ref_errs)) / 3


def test_stats_from_texts_failure_tolerant():
    assert stats_from_texts([], "mn", [], 24000, 256) is None
    assert stats_from_texts(["a"], "mn", [1.0], 24000, 256) is None  # < 8


def test_facade_target_len_uses_calibration():
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"sample_rate": 24000, "n_mels": 100,
           "model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 2,
                     "ff_mult": 2, "text_dim": 32, "conv_layers": 1}}
    model = F5TTS(F5Config.from_dict(cfg))
    text = "сайн байна уу"
    ids = model.text_cleaner.text_to_sequence(text, lang="mn")
    # reference heuristic: nonspace chars * 13
    base = model._target_len(text, ids, None, 0, [], 1.0)
    assert base == max(50, len(text.replace(" ", "")) * 13)
    model.set_duration_stats({"fpc": [20.0] * 65, "global": 20.0})
    assert model._target_len(text, ids, None, 0, [], 1.0) == max(
        50, int(len(ids) * 20.0))
    # explicit + ref-ratio rungs still outrank the calibrated table
    assert model._target_len(text, ids, 2.0, 0, [], 1.0) == int(
        2.0 * 24000 / 256)
    assert model._target_len(text, ids, None, 100, [1] * len(ids), 1.0) == \
        max(50, int(100 * len(ids) / len(ids)))
    # clearing restores reference behavior
    model.set_duration_stats(None)
    assert model._target_len(text, ids, None, 0, [], 1.0) == base


def test_fit_validates_inputs():
    with pytest.raises(ValueError):
        fit_duration_table([], [])
    with pytest.raises(ValueError):
        fit_duration_table([[1]], [1.0, 2.0])
