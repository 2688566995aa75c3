"""Capture a jax.profiler trace of a training step or synthesis workload.

Writes an XPlane trace viewable in TensorBoard's profile plugin
(tensorboard --logdir <out>), the replacement for the reference's
vram-counter-only telemetry.

    python scripts/profile.py --workload train --config configs/local.yaml
    python scripts/profile.py --workload infer --steps 8
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    parser = argparse.ArgumentParser(description="Profile OronTTS-TPU workloads")
    parser.add_argument("--workload", choices=["train", "infer"], default="infer")
    parser.add_argument("--config", type=str, default="configs/test.yaml")
    parser.add_argument("--out", type=str, default="output/profile")
    parser.add_argument("--steps", type=int, default=8,
                        help="ODE steps (infer) / train steps to trace")
    parser.add_argument("--frames", type=int, default=1664,
                        help="mel frames per sample")
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--device", type=str, default=None)
    args = parser.parse_args()

    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from oron_tts_tpu.config import F5Config, load_config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = F5Config.from_dict(load_config(args.config))
    model = F5TTS(cfg)
    model.init_params(0)
    rng = np.random.default_rng(0)
    T = args.frames

    if args.workload == "infer":
        text = rng.integers(0, 65, (1, T)).astype(np.int32)
        cond = np.zeros((1, T, model.n_mels), np.float32)
        noise = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (1, T, model.n_mels))
        )
        fn = model._sample_fn(T, args.steps, 2.0, -1.0)
        # compile outside the trace
        fn(model.variables, cond, text, np.asarray([T]), np.asarray([0]), noise)
        with jax.profiler.trace(args.out):
            out = fn(model.variables, cond, text, np.asarray([T]),
                     np.asarray([0]), noise)
            jax.block_until_ready(out)
            float(np.asarray(out).mean())  # force execution on lazy backends
    else:
        from oron_tts_tpu.train.trainer import F5Trainer

        class _Loader:
            dataset = []

            def __len__(self):
                return 1

            def __iter__(self):
                return iter(())

        trainer = F5Trainer(
            config=dict(cfg.raw, use_tqdm=False), model=model,
            train_loader=_Loader(), log_dir=args.out,
            checkpoint_dir=str(Path(args.out) / "ckpt"),
        )
        batch = {
            "mel": rng.standard_normal(
                (args.batch_size, model.n_mels, T)
            ).astype(np.float32),
            "text_ids": rng.integers(0, 65, (args.batch_size, T)).astype(np.int32),
            "mel_lengths": np.full((args.batch_size,), T, np.int32),
        }
        state, metrics = trainer._train_step(
            trainer.state, batch, jax.random.PRNGKey(0)
        )
        float(metrics["loss"])  # compile outside the trace
        trainer.state = state
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                trainer.state, metrics = trainer._train_step(
                    trainer.state, batch, jax.random.PRNGKey(i)
                )
                float(metrics["loss"])
    print(f"Trace written to {args.out} — view with: tensorboard --logdir {args.out}")


if __name__ == "__main__":
    main()
