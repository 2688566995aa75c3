"""Measure the built-in spectral-gating denoiser's SNR improvement.

Produces the honesty table for docs/USAGE.md (VERDICT r1 #10): synthetic
speech-like signal (harmonic series with pitch/amplitude modulation and
formant emphasis) + stationary noise at known input SNRs → output SNR after
``AudioDenoiser`` (48 kHz DeepFilterNet contract). The optional ``df``
backend is measured too when installed (it is not in this image).

    python scripts/measure_denoiser.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.data.denoiser import AudioDenoiser  # noqa: E402

SR = 24000


def speech_like(seconds: float = 4.0, seed: int = 0) -> np.ndarray:
    """Harmonic stack with vibrato, formant emphasis and syllabic AM."""
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    f0 = 140.0 * (1 + 0.08 * np.sin(2 * np.pi * 4.2 * t))  # vibrato
    phase = 2 * np.pi * np.cumsum(f0) / SR
    x = np.zeros(n)
    formants = [(500, 1.0), (1500, 0.5), (2500, 0.25)]
    for h in range(1, 24):
        fh = 140.0 * h
        gain = sum(a * np.exp(-0.5 * ((fh - fc) / 300.0) ** 2)
                   for fc, a in formants) + 0.02
        x += gain / h * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # syllabic amplitude modulation (~3.5 Hz) with pauses
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.5 * t - np.pi / 2))
    env = np.clip(env * 1.4 - 0.2, 0.0, 1.0)
    x *= env
    return (x / np.abs(x).max()).astype(np.float32)


def snr_db(clean: np.ndarray, test: np.ndarray) -> float:
    n = min(len(clean), len(test))
    clean, test = clean[:n], test[:n]
    noise = test - clean
    return 10 * np.log10(
        (np.sum(clean**2) + 1e-12) / (np.sum(noise**2) + 1e-12)
    )


def mel_l1(clean: np.ndarray, test: np.ndarray) -> float:
    """Mean abs log-mel difference vs clean — the metric the TTS pipeline
    actually consumes (denoised audio becomes training mels)."""
    from oron_tts_tpu.ops.mel import MelConfig, log_mel_numpy

    cfg = MelConfig(sample_rate=SR)
    n = min(len(clean), len(test))
    return float(np.mean(np.abs(
        log_mel_numpy(test[:n], cfg) - log_mel_numpy(clean[:n], cfg)
    )))


def main() -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, default=REPO_ROOT / "DENOISER.json")
    args = ap.parse_args()

    clean = speech_like()
    rng = np.random.default_rng(1)
    white = rng.standard_normal(len(clean)).astype(np.float32)
    # pink-ish noise: 1/f shaping in the frequency domain
    spec = np.fft.rfft(rng.standard_normal(len(clean)))
    freqs = np.maximum(np.fft.rfftfreq(len(clean), 1 / SR), 1.0)
    pink = np.fft.irfft(spec / np.sqrt(freqs), n=len(clean)).astype(np.float32)
    pink /= np.abs(pink).max()

    # ── non-stationary interference (VERDICT r4 #7) ──────────────────────
    # babble: several competing speech-like talkers at different pitches
    babble = np.zeros(len(clean), np.float32)
    for i, pitch in enumerate((0.7, 0.85, 1.2, 1.45)):
        talker = speech_like(seed=10 + i)
        shift = int(SR * 0.13 * (i + 1))
        babble += np.roll(talker, shift) * (0.8 + 0.1 * i)
    babble /= np.abs(babble).max()
    # music: arpeggiated triads changing every 250 ms (tonal, moving)
    t = np.arange(len(clean)) / SR
    music = np.zeros(len(clean), np.float32)
    root = 220.0
    chord = [1.0, 1.25, 1.5]
    for seg in range(int(len(clean) / SR / 0.25)):
        s0, s1 = int(seg * 0.25 * SR), int((seg + 1) * 0.25 * SR)
        f = root * (2 ** ((seg * 5) % 12 / 12)) * chord[seg % 3]
        music[s0:s1] = np.sin(2 * np.pi * f * t[s0:s1]) * 0.8
    # clicks: sparse broadband impulses (mouth clicks / pops)
    clicks = np.zeros(len(clean), np.float32)
    for pos in rng.integers(0, len(clean) - 32, size=40):
        clicks[pos:pos + 32] = rng.standard_normal(32) * np.hanning(32)
    clicks /= np.abs(clicks).max() + 1e-9

    backends = ["spectral"]
    try:
        import df  # noqa: F401

        backends.append("df")
    except ImportError:
        print("# df (DeepFilterNet) not installed — spectral only",
              file=sys.stderr)

    rows = []
    print("| noise | input SNR (dB) | input mel-L1 | " +
          " | ".join(f"{b} SNR (dB) / mel-L1" for b in backends) + " |")
    print("|---|---|---|" + "---|" * len(backends))
    for noise_name, noise in (("white", white), ("pink", pink),
                              ("babble", babble), ("music", music),
                              ("clicks", clicks)):
        for target_snr in (0.0, 5.0, 10.0, 20.0):
            sig_pow = np.mean(clean**2)
            noise_pow = np.mean(noise**2)
            scale = np.sqrt(sig_pow / noise_pow / 10 ** (target_snr / 10))
            noisy = clean + scale * noise
            inp_snr, inp_mel = float(snr_db(clean, noisy)), mel_l1(clean, noisy)
            row = {"noise": noise_name, "input_snr_db": round(inp_snr, 2),
                   "input_mel_l1": round(inp_mel, 4), "backends": {}}
            cols = []
            for backend in backends:
                den = AudioDenoiser(backend=backend)
                out = den.denoise(noisy.copy(), SR)
                o_snr, o_mel = float(snr_db(clean, out)), mel_l1(clean, out)
                row["backends"][backend] = {
                    "output_snr_db": round(o_snr, 2),
                    "output_mel_l1": round(o_mel, 4),
                }
                cols.append(f"{o_snr:.1f} / {o_mel:.3f}")
            rows.append(row)
            print(f"| {noise_name} | {inp_snr:.1f} | {inp_mel:.3f} | "
                  + " | ".join(cols) + " |")

    payload = {
        "protocol": "synthetic speech-like harmonic signal + calibrated "
                    "stationary (white/pink) AND non-stationary "
                    "(babble/music/clicks) interference "
                    "(scripts/measure_denoiser.py)",
        "sample_rate": SR,
        "backends_measured": backends,
        "df_installed": "df" in backends,
        "note": ("spectral gating estimates ONE noise profile from quiet "
                 "frames, so it attenuates stationary noise (white/pink "
                 "rows) but largely PASSES THROUGH non-stationary "
                 "interference — expect the babble/music/clicks rows to "
                 "show little SNR gain and sometimes mild loss (speech "
                 "energy removed along with the misestimated profile). "
                 "That is exactly where the reference's learned "
                 "DeepFilterNet (denoiser.py:22-54) wins; install the "
                 "optional `df` backend (docs/USAGE.md) to close it. Same "
                 "48 kHz resample-in/out contract either way."),
        "rows": rows,
    }
    args.out.write_text(json.dumps(payload, indent=1))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
