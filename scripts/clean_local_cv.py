"""Process a local Common Voice tar.gz without the HF hub.

Parity with reference scripts/clean_local_cv.py: find the TSV + clips inside
the archive, decode MP3 via an ffmpeg subprocess pipe, clean text, optional
denoise, normalize, trim, gate by duration 0.5–15 s, write wavs +
metadata.json with a client_id→speaker_id mapping.
"""

import argparse
import csv
import io
import json
import shutil
import subprocess
import sys
import tarfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

MIN_DUR_S = 0.5
MAX_DUR_S = 15.0


def load_mp3_bytes(raw: bytes, target_sr: int):
    """Decode MP3 bytes → mono float32 at target_sr via ffmpeg pipe."""
    import numpy as np

    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg is required to decode Common Voice MP3 clips")
    proc = subprocess.run(
        ["ffmpeg", "-v", "quiet", "-i", "pipe:0",
         "-f", "f32le", "-ac", "1", "-ar", str(target_sr), "pipe:1"],
        input=raw, stdout=subprocess.PIPE, check=True,
    )
    return np.frombuffer(proc.stdout, dtype="<f4").copy()


def extract_and_process_cv(
    archive_path: Path,
    out_dir: Path,
    lang: str = "mn",
    denoise: bool = False,
    sample_rate: int = 24000,
    max_samples: int | None = None,
) -> list[dict]:
    from oron_tts_tpu.data import wav as wavio
    from oron_tts_tpu.data.denoiser import AudioDenoiser
    from oron_tts_tpu.text import TextCleaner

    cleaner = TextCleaner()
    denoiser = AudioDenoiser(target_sample_rate=sample_rate) if denoise else None
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "wavs").mkdir(exist_ok=True)

    with tarfile.open(archive_path, "r:*") as tar:
        members = {m.name: m for m in tar.getmembers() if m.isfile()}
        tsv_name = next(
            (n for n in members if n.endswith("validated.tsv")),
            next((n for n in members if n.endswith(".tsv")), None),
        )
        if tsv_name is None:
            raise RuntimeError("no TSV found in archive")
        tsv_file = tar.extractfile(members[tsv_name])
        assert tsv_file is not None
        rows = list(csv.DictReader(
            io.TextIOWrapper(tsv_file, encoding="utf-8"), delimiter="\t"
        ))
        print(f"TSV: {tsv_name} ({len(rows)} rows)")

        clip_dirs = {str(Path(n).parent) for n in members if n.endswith(".mp3")}
        clip_dir = next(iter(clip_dirs), "clips")

        speaker_ids: dict[str, int] = {}
        metadata: list[dict] = []
        skipped = 0
        for row in rows:
            if max_samples and len(metadata) >= max_samples:
                break
            try:
                clip = row.get("path", "")
                member = members.get(f"{clip_dir}/{clip}") or members.get(clip)
                if member is None:
                    skipped += 1
                    continue
                text = cleaner.clean(row.get("sentence", ""), lang=lang)
                if not text:
                    skipped += 1
                    continue
                f = tar.extractfile(member)
                assert f is not None
                audio = load_mp3_bytes(f.read(), sample_rate)
                if denoiser is not None:
                    audio = denoiser.denoise(audio, sample_rate)
                audio = wavio.normalize_peak(audio)
                audio = wavio.trim_silence(audio)
                dur = len(audio) / sample_rate
                if not (MIN_DUR_S <= dur <= MAX_DUR_S):
                    skipped += 1
                    continue
                client = row.get("client_id", "0")
                spk = speaker_ids.setdefault(client, len(speaker_ids))
                wav_path = out_dir / "wavs" / f"{len(metadata):06d}.wav"
                wavio.write_wav(wav_path, audio, sample_rate)
                metadata.append({
                    "audio_path": str(wav_path),
                    "text": text,
                    "lang": lang,
                    "speaker_id": str(spk),
                })
            except Exception as exc:
                print(f"[WARN] row failed: {exc}")
                skipped += 1
        print(f"Kept {len(metadata)}, skipped {skipped}")

    (out_dir / "metadata.json").write_text(
        json.dumps(metadata, ensure_ascii=False, indent=2)
    )
    return metadata


def main() -> None:
    parser = argparse.ArgumentParser(description="Clean a local Common Voice tar.gz")
    parser.add_argument("--archive", type=str, required=True)
    parser.add_argument("--output-dir", type=str, default="data/processed")
    parser.add_argument("--lang", type=str, default="mn", choices=["mn", "kz"])
    parser.add_argument("--denoise", action="store_true")
    parser.add_argument("--max-samples", type=int, default=None)
    args = parser.parse_args()
    extract_and_process_cv(
        Path(args.archive), Path(args.output_dir), lang=args.lang,
        denoise=args.denoise, max_samples=args.max_samples,
    )


if __name__ == "__main__":
    main()
