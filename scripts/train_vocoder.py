"""Train the Vocos-style vocoder (mel → waveform) on local or HF audio.

Not present in the reference (it depends on the pretrained
charactr/vocos-mel-24khz); this makes the framework self-sufficient when
that checkpoint is unreachable. Checkpoints land as vocos_step_*.npz and
plug into infer.py --vocoder / ORON_VOCOS_CKPT.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    parser = argparse.ArgumentParser(description="Train OronTTS vocoder")
    parser.add_argument("--data-dir", type=str, required=True,
                        help="Directory with metadata.json (prepare.py output)")
    parser.add_argument("--checkpoint-dir", type=str, default="output/vocoder")
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--crop-frames", type=int, default=64)
    parser.add_argument("--learning-rate", type=float, default=2e-4)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--n-layers", type=int, default=8)
    parser.add_argument("--save-interval", type=int, default=5000)
    parser.add_argument("--log-interval", type=int, default=100)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--device", type=str, default=None)
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np
    import optax

    from oron_tts_tpu.data.wav import normalize_peak, read_wav, resample
    from oron_tts_tpu.models.vocos import VocosDecoder
    from oron_tts_tpu.ops.mel import MelConfig
    from oron_tts_tpu.train.checkpoint import CheckpointManager
    from oron_tts_tpu.train.vocoder import crop_batch, make_vocoder_train_step

    metadata = json.loads((Path(args.data_dir) / "metadata.json").read_text())
    mel_cfg = MelConfig()
    print(f"Loading {len(metadata)} clips...")
    audios = []
    for m in metadata:
        wav, sr = read_wav(m["audio_path"])
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if sr != mel_cfg.sample_rate:
            wav = resample(wav, sr, mel_cfg.sample_rate)
        audios.append(normalize_peak(wav.astype(np.float32)))

    vocoder = VocosDecoder(dim=args.dim, n_layers=args.n_layers,
                           intermediate_dim=args.dim * 3)
    mels0, _ = crop_batch(audios[:1], mel_cfg, args.crop_frames,
                          np.random.default_rng(0))
    variables = vocoder.init(jax.random.PRNGKey(0), mels0)
    params = variables["params"]

    schedule = optax.cosine_decay_schedule(args.learning_rate, args.steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))
    opt_state = tx.init(params)
    step_fn = make_vocoder_train_step(vocoder, tx, mel_cfg)

    cm = CheckpointManager(args.checkpoint_dir, model_name="vocos",
                           max_checkpoints=3)
    start_step = 0
    if args.resume:
        info = cm.load()
        if info.get("params") is not None:
            params = info["params"]
            start_step = int(info.get("step", 0))
            print(f"Resumed from step {start_step}")

    rng = np.random.default_rng(1)
    t0 = time.monotonic()
    for step in range(start_step, args.steps):
        idx = rng.choice(len(audios), size=args.batch_size)
        mels, wavs = crop_batch([audios[i] for i in idx], mel_cfg,
                                args.crop_frames, rng)
        params, opt_state, loss, gnorm = step_fn(params, opt_state, mels, wavs)
        if (step + 1) % args.log_interval == 0:
            rate = (step + 1 - start_step) / (time.monotonic() - t0)
            print(f"step {step + 1}/{args.steps} | loss={float(loss):.4f} | "
                  f"gnorm={float(gnorm):.3f} | {rate:.1f} it/s", flush=True)
        if (step + 1) % args.save_interval == 0 or step + 1 == args.steps:
            cm.save(step + 1, params, loss=float(loss),
                    config={"dim": args.dim, "n_layers": args.n_layers,
                            "intermediate_dim": args.dim * 3,
                            "head_mode": "real_imag"})
    print(f"Done. Use: infer.py --vocoder "
          f"{cm.latest_checkpoint()}")


if __name__ == "__main__":
    main()
