#!/usr/bin/env python
"""Generate the tone-code alignment corpus (evals/alignment.py protocol).

Each sentence is random Mongolian-alphabet "words"; its waveform is the
deterministic letter→tone rendering from oron_tts_tpu.evals.alignment —
audio is a pure function of the character sequence, so a model trained on
this corpus can be scored objectively: invert generated mels back to
letters and compute CER (scripts/eval_tts_alignment.py). The reference
ships no quantitative quality metric at all (SURVEY.md §6); this is the
framework's no-network, no-human-listener substitute.

Library use: ``build_corpus(n, seed)`` returns (texts, wavs) in memory.
CLI use: writes ``wav/%05d.wav`` + ``metadata.json`` under --out, the
TTSDataset directory layout.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.evals.alignment import LETTERS, SR, render_text  # noqa: E402


def sample_sentence(rng: np.random.Generator,
                    min_words: int = 3, max_words: int = 5,
                    min_len: int = 2, max_len: int = 6) -> str:
    """Random words of uniform random letters (no language model needed:
    the protocol tests alignment, not linguistics).

    Sentences are kept >= 9 cleaned chars: every char renders 13 frames =
    0.139 s, and TTSDataset drops clips under 1.0 s (data/dataset.py).
    """
    n_words = int(rng.integers(min_words, max_words + 1))
    words = []
    for _ in range(n_words):
        n = int(rng.integers(min_len, max_len + 1))
        words.append("".join(rng.choice(list(LETTERS), size=n)))
    while len(" ".join(words)) < 9:
        n = int(rng.integers(min_len, max_len + 1))
        words.append("".join(rng.choice(list(LETTERS), size=n)))
    return " ".join(words)


def build_corpus(n_sentences: int, seed: int = 0,
                 **kw) -> tuple[list[str], list[np.ndarray]]:
    """(texts, wavs) — deterministic in (n_sentences, seed).

    The first ~5 sentences (18 letter pairs grouped 4 per sentence) cover
    the full alphabet so every tone bin appears in training; full coverage
    therefore needs n_sentences >= len(cover) (= 5 for the 35-letter set).
    """
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    # alphabet coverage floor: "аб вг дё ..." style pair-words; groups are
    # padded with wrap-around pairs so every cover sentence clears the same
    # >=9-char duration floor as the sampled ones
    pairs = [LETTERS[i:i + 2] for i in range(0, len(LETTERS), 2)]
    cover = []
    for i in range(0, len(pairs), 4):
        group = pairs[i:i + 4]
        j = 0
        while len(" ".join(group)) < 9:
            group.append(pairs[j % len(pairs)])
            j += 1
        cover.append(" ".join(group))
    texts.extend(cover[: min(len(cover), n_sentences)])
    while len(texts) < n_sentences:
        texts.append(sample_sentence(rng, **kw))
    wavs = [render_text(t) for t in texts]
    return texts, wavs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--sentences", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-words", type=int, default=3,
                    help="min words per sentence (13 frames ≈ 0.139 s per "
                         "char incl. spaces; raise for longer clips)")
    ap.add_argument("--max-words", type=int, default=5)
    args = ap.parse_args()

    from oron_tts_tpu.data.wav import write_wav

    texts, wavs = build_corpus(args.sentences, args.seed,
                               min_words=args.min_words,
                               max_words=args.max_words)
    wav_dir = args.out / "wav"
    wav_dir.mkdir(parents=True, exist_ok=True)
    meta = []
    for i, (text, wav) in enumerate(zip(texts, wavs)):
        rel = f"wav/{i:05d}.wav"
        write_wav(args.out / rel, wav, SR)
        meta.append({"audio_path": str((args.out / rel).resolve()),
                     "text": text, "lang": "mn",
                     "duration": len(wav) / SR})
    (args.out / "metadata.json").write_text(
        json.dumps(meta, ensure_ascii=False, indent=1)
    )
    total_s = sum(m["duration"] for m in meta)
    print(f"wrote {len(meta)} clips ({total_s:.1f}s audio) to {args.out}")


if __name__ == "__main__":
    main()
