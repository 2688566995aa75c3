#!/usr/bin/env python
"""End-to-end "did it learn TTS?" eval: train F5-TTS on the tone-code
corpus, synthesize held-out sentences ref-free, and score character error
rate by inverting the generated mels back to letters
(oron_tts_tpu/evals/alignment.py protocol).

The corpus makes audio a deterministic function of text, so CER measures
exactly what a TTS framework must learn — text→frame alignment plus
per-character acoustics — with no network, pretrained ASR, or human
listeners. An untrained model scores CER ≈ 1 (tests/test_alignment_eval.py
pins > 0.5); a model that learned text-conditioned generation approaches 0.
The reference ships no quantitative quality metric (SURVEY.md §6).

Writes a JSON artifact (--out, default ALIGNMENT.json at the repo root):
holdout CER for raw and EMA weights, the untrained baseline, and the
train/runtime configuration.

Typical run (one v5e chip, ~10 min):
    python scripts/eval_tts_alignment.py --epochs 60
CPU smoke (minutes, higher CER):
    python scripts/eval_tts_alignment.py --device cpu --sentences 64 \
        --dim 64 --depth 2 --heads 2 --epochs 8 --holdout 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sentences", type=int, default=512,
                    help="corpus size incl. holdout")
    ap.add_argument("--holdout", type=int, default=24,
                    help="held-out sentences scored after training")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--text-dim", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--frames-budget", type=int, default=8192,
                    help="DynamicBatchSampler frame budget per batch")
    ap.add_argument("--n-steps", type=int, default=32,
                    help="ODE steps at eval synthesis")
    ap.add_argument("--cfg-strength", type=float, default=2.0)
    ap.add_argument("--device", type=str, default=None,
                    help="pin JAX platform (cpu/tpu/axon); default: leave as-is")
    ap.add_argument("--out", type=Path, default=REPO_ROOT / "ALIGNMENT.json")
    args = ap.parse_args()
    if args.epochs < 1:
        ap.error("--epochs must be >= 1 (the payload reports final train loss)")
    return args


def score(model, texts: list[str], n_steps: int, cfg_strength: float,
          seed: int, exact_duration: bool = True) -> tuple[float, list[float]]:
    """Mean holdout CER: synthesize each text ref-free, invert, compare.

    exact_duration=True passes the corpus' true canvas length
    (13 frames x cleaned chars INCLUDING spaces) so the generated mel sits
    at the training distribution's duration; False uses the facade's
    ref-free heuristic (13 x non-space chars — ~15% shorter on this
    corpus because spaces render silence but don't count), which scores
    alignment robustness to an out-of-distribution canvas too.
    """
    from oron_tts_tpu.evals.alignment import (
        FRAMES_PER_CHAR, HOP, SR, char_error_rate, decode_logmel,
        expected_letters,
    )
    from oron_tts_tpu.text.cleaner import TextCleaner

    cleaner = TextCleaner()
    cers = []
    for i, text in enumerate(texts):
        dur_s = None
        if exact_duration:
            n_chars = len(cleaner.clean(text, "mn"))
            dur_s = n_chars * FRAMES_PER_CHAR * HOP / SR
        mel = model.synthesize_mel(
            text, n_steps=n_steps, cfg_strength=cfg_strength, seed=seed + i,
            target_duration_s=dur_s,
        )
        cers.append(char_error_rate(expected_letters(text),
                                    decode_logmel(np.asarray(mel))))
    return float(np.mean(cers)), [round(c, 4) for c in cers]


def main() -> None:
    args = parse_args()
    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)

    import jax

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.data.dataset import (
        DynamicBatchSampler, TTSCollator, TTSDataset,
    )
    from oron_tts_tpu.data.loader import DataLoader
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.train.trainer import F5Trainer
    from make_tone_corpus import build_corpus

    texts, wavs = build_corpus(args.sentences, args.seed)
    if not 0 < args.holdout < len(texts):
        raise SystemExit("--holdout must be in (0, --sentences)")
    # the alphabet-coverage sentences lead the corpus; hold out from the tail
    hold_texts = texts[-args.holdout:]
    train_texts, train_wavs = texts[:-args.holdout], wavs[:-args.holdout]

    sr = 24000
    ds = TTSDataset(audio_arrays=train_wavs, texts=train_texts, sample_rate=sr)
    durations = [len(w) / sr for w in train_wavs]
    loader = DataLoader(
        ds,
        DynamicBatchSampler(durations, args.frames_budget, sample_rate=sr),
        # row padding to a multiple of 8 collapses the sampler's
        # every-batch-unique (B, T) shapes into ~9 jit combos instead of
        # 16 — on the TPU tunnel each combo is a 60-100 s AOT compile, so
        # this halves the first-epoch wall time (padded rows have
        # mel_lengths 0 and drop out of the masked loss)
        TTSCollator(pad_batch_to_multiple=8),
        num_workers=0,
    )

    cfg = {
        "sample_rate": sr, "n_mels": 100,
        "learning_rate": args.lr, "warmup_steps": 200,
        "num_epochs": args.epochs, "ema_decay": 0.995,
        "max_grad_norm": 1.0, "use_tqdm": False,
        "audio_sample_interval": 10**9, "log_interval": 10**9,
        "model": {
            "vocab_size": 65, "dim": args.dim, "depth": args.depth,
            "heads": args.heads, "ff_mult": 2, "text_dim": args.text_dim,
            "conv_layers": 2, "p_dropout": 0.0,
        },
    }
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(args.seed)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(model.variables)
    )
    print(f"model: dim={args.dim} depth={args.depth} params={n_params/1e6:.1f}M "
          f"backend={jax.default_backend()}")

    if os.environ.get("ORON_ALIGN_SKIP_BASELINE"):
        untrained_cer = float("nan")
        print("skipping untrained baseline (ORON_ALIGN_SKIP_BASELINE)")
    else:
        untrained_cer, _ = score(
            model, hold_texts[: min(4, len(hold_texts))],
            args.n_steps, args.cfg_strength, args.seed,
        )
        print(f"untrained baseline CER (4 clips): {untrained_cer:.3f}")

    trainer = F5Trainer(
        config=cfg, model=model, train_loader=loader,
        log_dir="/tmp/oron_align_logs", checkpoint_dir="/tmp/oron_align_ckpt",
    )
    t0 = time.time()
    for epoch in range(args.epochs):
        loss = trainer.train_epoch(total_epochs=args.epochs)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch + 1}/{args.epochs} loss={loss:.4f} "
                  f"({time.time() - t0:.0f}s)")
    train_s = time.time() - t0

    # calibrated ref-free duration (VERDICT r4 #3): fit the per-token
    # frames table from the TRAINING split only, exactly as
    # cli/train.py does for real corpora
    from oron_tts_tpu.data.duration_stats import stats_from_texts

    dur_stats = stats_from_texts(
        train_texts, "mn", [len(w) / sr for w in train_wavs], sr, 256,
    )

    results = {}
    for name, params in (("raw", trainer.state.params),
                         ("ema", trainer.state.ema_params)):
        model.variables = {"params": params}
        cer, per_clip = score(model, hold_texts, args.n_steps,
                              args.cfg_strength, args.seed)
        model.set_duration_stats(None)
        cer_rf, _ = score(model, hold_texts, args.n_steps,
                          args.cfg_strength, args.seed, exact_duration=False)
        model.set_duration_stats(dur_stats)
        cer_cal, _ = score(model, hold_texts, args.n_steps,
                           args.cfg_strength, args.seed,
                           exact_duration=False)
        model.set_duration_stats(None)
        results[name] = {"cer": round(cer, 4), "per_clip": per_clip,
                         "cer_reffree_duration": round(cer_rf, 4),
                         "cer_reffree_calibrated": round(cer_cal, 4)}
        print(f"holdout CER ({name}): {cer:.4f} "
              f"(ref-free heuristic: {cer_rf:.4f}, "
              f"calibrated: {cer_cal:.4f})")

    payload = {
        "protocol": "tone-code alignment (oron_tts_tpu/evals/alignment.py)",
        "backend": jax.default_backend(),
        "untrained_cer_4clip": round(untrained_cer, 4),
        "holdout": results,
        "train_seconds": round(train_s, 1),
        "steps": int(trainer.state.step),
        # raw-frame throughput over the whole run (decode + collate +
        # device step + eval-epoch overheads included)
        "frames_per_s": round(
            args.epochs * sum(len(w) // 256 for w in train_wavs) / train_s
        ),
        "final_train_loss": round(float(loss), 4),
        "config": {k: cfg[k] for k in
                   ("learning_rate", "num_epochs", "ema_decay", "model")},
        "sentences": args.sentences, "holdout_n": args.holdout,
        "n_steps": args.n_steps, "cfg_strength": args.cfg_strength,
        "seed": args.seed,
        "duration_stats_global": (
            dur_stats["global"] if dur_stats else None
        ),
    }
    args.out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
