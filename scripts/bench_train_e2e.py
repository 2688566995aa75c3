#!/usr/bin/env python
"""Steady-state Base training throughput on the REAL data path.

Generates a tone-code corpus with an MBSpeech-like duration distribution
(~4.7-11 s clips), then drives `scripts/train.py --from-local` — the
actual CLI: TTSDataset wav decode + mel extraction in DataLoader workers,
DynamicBatchSampler frame budgeting, collator (rows, T) bucketing,
per-epoch validation — for N epochs on the chip, parsing the trainer's
epoch logs into frames/s. Writes TRAIN_E2E.json with:

- epoch-1 wall time (pays every bucket's AOT compile through the tunnel)
- steady-state epochs (>= 3) frames/s and audio-s/s
- the gap vs bench.py's fixed-shape synthetic number (29.2k frames/s)

    python scripts/bench_train_e2e.py               # TPU, ~30-40 min
    python scripts/bench_train_e2e.py --smoke       # CPU, tiny model

VERDICT r3 #3; the reference's only training figure is epoch time
(/root/reference/README.md:299), so this is also the apples-to-apples
comparison protocol.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sentences", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--data-dir", type=Path, default=Path("/tmp/oron_e2e_corpus"))
    ap.add_argument("--work-dir", type=Path, default=Path("/tmp/oron_e2e_run"))
    ap.add_argument("--smoke", action="store_true",
                    help="CPU, tiny model, few clips (pipeline check only)")
    ap.add_argument("--out", type=Path, default=REPO_ROOT / "TRAIN_E2E.json")
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from make_tone_corpus import build_corpus

    from oron_tts_tpu.data.wav import write_wav

    n = 24 if args.smoke else args.sentences
    # narrow duration band (~8.9-9.6 s → 832-897 frames, one 1024-frame
    # bucket; 24 clips ≈ the 24,576-frame budget) so every batch collates
    # to the SAME (24, 1024) shape ≈ bench.py's B=12 T=2048 frame count —
    # the no-remat fast path, one AOT compile, apples-to-apples. The
    # broad-duration variant (8-16 words, mixed buckets) exercised more
    # shapes but its largest remat batch sat close enough to the HBM
    # ceiling that epoch-2 allocator order OOMed (see docs/KERNELS.md
    # "end-to-end epoch throughput").
    kw = {} if args.smoke else {"min_words": 13, "max_words": 14,
                                "min_len": 4, "max_len": 4}
    t0 = time.time()
    texts, wavs = build_corpus(n, 0, **kw)
    sr = 24000
    wav_dir = args.data_dir / "wav"
    wav_dir.mkdir(parents=True, exist_ok=True)
    meta, total_s = [], 0.0
    for i, (text, wav) in enumerate(zip(texts, wavs)):
        rel = f"wav/{i:05d}.wav"
        write_wav(args.data_dir / rel, wav, sr)
        meta.append({"audio_path": str((args.data_dir / rel).resolve()),
                     "text": text, "lang": "mn", "duration": len(wav) / sr})
        total_s += len(wav) / sr
    (args.data_dir / "metadata.json").write_text(
        json.dumps(meta, ensure_ascii=False))
    # 90/10 split in cli/train.py: only ~90% of the audio is trained on
    train_s = total_s * 0.9
    train_frames = int(train_s * sr / 256)
    print(f"corpus: {n} clips, {total_s / 60:.1f} min audio "
          f"({time.time() - t0:.0f}s to generate)", flush=True)

    cfg = "configs/test.yaml" if args.smoke else "configs/bench_e2e.yaml"
    cmd = [sys.executable, str(REPO_ROOT / "scripts" / "train.py"),
           "--config", cfg, "--from-local",
           "--data-dir", str(args.data_dir),
           "--num-epochs", str(2 if args.smoke else args.epochs),
           "--checkpoint-dir", str(args.work_dir / "ckpt"),
           "--log-dir", str(args.work_dir / "logs")]
    if args.smoke:
        cmd += ["--device", "cpu"]
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=str(REPO_ROOT), timeout=7200)
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    (args.work_dir / "train.log").parent.mkdir(parents=True, exist_ok=True)
    (args.work_dir / "train.log").write_text(log)
    if proc.returncode != 0:
        print(log[-4000:])
        raise SystemExit(f"train.py failed rc={proc.returncode}")

    # "↳ epoch N: 33.3s | 1 samples/s | avg_loss=..."
    epoch_s = [float(m.group(1)) for m in
               re.finditer(r"epoch \d+: ([0-9.]+)s \|", log)]
    if not epoch_s:
        print(log[-4000:])
        raise SystemExit("no epoch timings found in train.py output")
    steady = epoch_s[2:] if len(epoch_s) > 3 else epoch_s[-1:]
    steady_s = sum(steady) / len(steady)
    payload = {
        "protocol": "scripts/train.py --from-local on a tone-code corpus "
                    "(real TTSDataset/DynamicBatchSampler/collator/val path)",
        "config": cfg,
        "clips": n, "audio_minutes": round(total_s / 60, 1),
        "train_frames_per_epoch": train_frames,
        "epochs": len(epoch_s),
        "epoch_seconds": [round(s, 1) for s in epoch_s],
        "epoch1_s": round(epoch_s[0], 1),
        "steady_epoch_s": round(steady_s, 2),
        "steady_frames_per_s": round(train_frames / steady_s),
        "steady_audio_s_per_s": round(train_s / steady_s, 1),
        "total_wall_s": round(wall, 1),
        "bench_fixed_shape_frames_per_s": 29179,
        "ratio_vs_fixed_shape": round(
            train_frames / steady_s / 29179, 3),
    }
    args.out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
