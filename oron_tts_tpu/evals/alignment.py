"""Tone-code alignment protocol: an objective "did the framework learn TTS?"
metric that needs no network, no human listeners, and no pretrained ASR.

Protocol
--------
Each Mongolian letter is assigned a pure tone whose fundamental sits exactly
on one mel filterbank center (two bins apart per letter, so letters are
separable by per-frame argmax over the standard 100-mel features). A corpus
is rendered where the audio is a *deterministic function of the character
sequence*: 11 frames of tone + 2 frames of gap per letter, 13 frames of
silence per space/punctuation — matching the facade's ref-free duration
heuristic of 13 frames per non-space char (models/f5tts.py, reference
f5tts.py:365-375), so inference-time durations land in-distribution.

Training F5-TTS on this corpus forces the model to learn the full task:
text→audio alignment (which frames belong to which character) AND acoustics
(which frequency each character is). After training, ``decode_waveform``
inverts synthesized audio back to a letter string by frame-wise mel argmax +
silence-gap segmentation (CTC-style, robust to time warps from the duration
cascade), and ``char_error_rate`` scores it against the cleaned input text.
A model that merely memorizes audio marginals scores CER ≈ 1; only genuine
text-conditioned generation reaches CER ≈ 0. The reference has no analogue —
it ships zero quantitative quality metrics (SURVEY.md §6).

Used by scripts/make_tone_corpus.py (corpus generation) and
scripts/eval_tts_alignment.py (post-training scoring).
"""

from __future__ import annotations

import numpy as np

from oron_tts_tpu.ops.mel import MelConfig, _mel_to_hz_htk, log_mel_numpy
from oron_tts_tpu.text.tokenizer import MN_CHARS

SR = 24000
HOP = 256
FRAMES_PER_CHAR = 13  # matches the ref-free duration rule: chars*13 frames
TONE_FRAMES = 9       # per letter: 9 frames tone + 4 frames gap — the gap is
#                       wide enough (1024 samples = one full STFT window) for
#                       its center frame to reach true silence, so repeated
#                       letters stay separable after analysis smearing
AMPLITUDE = 0.5
RAMP = 128            # raised-cosine fade samples at tone edges

# Letter i -> mel filterbank bin 12 + 2i (bins 12..80 for the 35 MN letters).
# Filterbank triangle k peaks at mel point (k+1) * mel_max / (n_mels + 1)
# (ops/mel.py:mel_filterbank), so placing fundamentals exactly on peak mels
# makes per-frame argmax land on the letter's own bin.
FIRST_BIN = 12
BIN_STEP = 2
LETTERS = MN_CHARS  # 35 letters, index = tone order


def _default_cfg() -> MelConfig:
    return MelConfig()


def letter_bins() -> dict[str, int]:
    return {ch: FIRST_BIN + BIN_STEP * i for i, ch in enumerate(LETTERS)}


def letter_frequencies(cfg: MelConfig | None = None) -> dict[str, float]:
    """Fundamental per letter: the Hz of its assigned mel-bin peak."""
    cfg = cfg or _default_cfg()
    mel_max = float(
        np.asarray(
            2595.0 * np.log10(1.0 + (cfg.sample_rate / 2) / 700.0)
        )
    )
    out = {}
    for ch, b in letter_bins().items():
        peak_mel = (b + 1) * mel_max / (cfg.n_mels + 1)
        out[ch] = float(_mel_to_hz_htk(np.asarray(peak_mel)))
    return out


def expected_letters(text: str, lang: str = "mn") -> str:
    """The decode target: cleaned text restricted to MN letters."""
    from oron_tts_tpu.text.cleaner import TextCleaner

    cleaned = TextCleaner().clean(text, lang)
    return "".join(c for c in cleaned if c in LETTERS)


def render_text(text: str, lang: str = "mn") -> np.ndarray:
    """Deterministic waveform for a sentence (cleaned in-function).

    Letters: TONE_FRAMES frames of f0 (+0.25 x 2nd harmonic when below
    Nyquist headroom) then a 4-frame gap — the gap separates repeated
    letters so segmentation never merges them. Everything else (space,
    punctuation): FRAMES_PER_CHAR frames of silence.
    """
    from oron_tts_tpu.text.cleaner import TextCleaner

    cleaned = TextCleaner().clean(text, lang)
    freqs = letter_frequencies()
    char_samps = FRAMES_PER_CHAR * HOP
    tone_samps = TONE_FRAMES * HOP
    ramp = 0.5 - 0.5 * np.cos(np.linspace(0, np.pi, RAMP, dtype=np.float32))

    pieces: list[np.ndarray] = []
    for ch in cleaned:
        seg = np.zeros(char_samps, dtype=np.float32)
        f0 = freqs.get(ch)
        if f0 is not None:
            t = np.arange(tone_samps, dtype=np.float32) / SR
            tone = np.sin(2 * np.pi * f0 * t)
            if 2 * f0 < 10000.0:
                tone = tone + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
            tone *= AMPLITUDE
            tone[:RAMP] *= ramp
            tone[-RAMP:] *= ramp[::-1]
            seg[:tone_samps] = tone
        pieces.append(seg)
    if not pieces:
        return np.zeros(char_samps, dtype=np.float32)
    return np.concatenate(pieces)


def decode_waveform(
    wav: np.ndarray,
    cfg: MelConfig | None = None,
    voiced_threshold: float = -2.0,
    min_run: int = 3,
) -> str:
    """Invert audio to a letter string (see :func:`decode_logmel`)."""
    cfg = cfg or _default_cfg()
    logmel = log_mel_numpy(np.asarray(wav, dtype=np.float32), cfg)  # [M, T]
    return decode_logmel(logmel, voiced_threshold, min_run)


def decode_logmel(
    logmel: np.ndarray,
    voiced_threshold: float = -2.0,
    min_run: int = 3,
) -> str:
    """Invert a [n_mels, T] log-mel to a letter string (CTC-style collapse).

    Per frame: nearest letter to the mel argmax when the frame is voiced,
    else a silence symbol. Run-length encode; letter runs >= min_run frames
    emit their letter; adjacent equal letters merge UNLESS a silence run
    separates them (every rendered letter ends in a gap, so true repeats
    like "уу" stay distinct). Robust to the sampler's time warps: boundaries
    come from symbol changes and energy gaps, not fixed slots, so only the
    ORDER of tones must survive generation.

    Taking log-mel (not audio) as the primary entry point lets the TTS
    alignment eval score the model's OWN output domain — the CFM samples
    mels; running them through a speech-trained vocoder first would
    confound the text→mel alignment score with vocoder out-of-distribution
    error on pure tones (measured: roundtrip CER 0.000 from mel vs
    0.09–0.19 through the bundled speech vocoder).
    """
    logmel = np.asarray(logmel, dtype=np.float32)
    peak = logmel.max(axis=0)
    argmax = logmel.argmax(axis=0)

    bins = letter_bins()
    bin_list = np.asarray(list(bins.values()))
    chars = list(bins.keys())

    SILENCE = -1
    syms = np.where(
        peak > voiced_threshold,
        np.abs(bin_list[None, :] - argmax[:, None]).argmin(axis=1),
        SILENCE,
    )

    out: list[str] = []
    sep_since_emit = True  # silence seen since the last emitted letter
    run_sym, run_len = SILENCE, 0
    for s in list(syms) + [SILENCE - 1]:  # sentinel flushes the last run
        if s == run_sym:
            run_len += 1
            continue
        # close the previous run
        if run_sym == SILENCE:
            if run_len >= 1:
                sep_since_emit = True
        elif run_sym >= 0 and run_len >= min_run:
            letter = chars[int(run_sym)]
            if sep_since_emit or not out or out[-1] != letter:
                out.append(letter)
            sep_since_emit = False
        run_sym, run_len = s, 1
    return "".join(out)


def char_error_rate(ref: str, hyp: str) -> float:
    """Levenshtein distance / len(ref). ref must be non-empty."""
    if not ref:
        raise ValueError("empty reference")
    prev = list(range(len(hyp) + 1))
    for i, rc in enumerate(ref, 1):
        cur = [i]
        for j, hc in enumerate(hyp, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (rc != hc))
            )
        prev = cur
    return prev[-1] / len(ref)
