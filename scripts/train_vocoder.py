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
    parser.add_argument("--head-mode", type=str, default="mag_phase",
                        choices=["mag_phase", "real_imag"],
                        help="mag_phase (official Vocos parametrization; "
                             "trains far better from scratch) or real_imag "
                             "(the reference stub's head)")
    parser.add_argument("--save-interval", type=int, default=5000)
    parser.add_argument("--log-interval", type=int, default=100)
    parser.add_argument("--holdout-frac", type=float, default=0.05,
                        help="Tail fraction of the corpus excluded from "
                             "training (eval_vocoder.py scores on it)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--gan", action="store_true",
                        help="Enable the adversarial stage (MPD+MRD, LSGAN)")
    parser.add_argument("--gan-start-step", type=int, default=0,
                        help="Step at which the GAN stage kicks in")
    parser.add_argument("--disc-lr", type=float, default=2e-4)
    parser.add_argument("--device", type=str, default=None)
    args = parser.parse_args()

    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np
    import optax

    from oron_tts_tpu.data.wav import normalize_peak, read_wav, resample
    from oron_tts_tpu.models.vocos import VocosDecoder
    from oron_tts_tpu.ops.mel import MelConfig
    from oron_tts_tpu.train.checkpoint import CheckpointManager
    from oron_tts_tpu.train.vocoder import (
        crop_batch,
        make_vocoder_superstep,
        pack_corpus,
    )

    metadata = json.loads((Path(args.data_dir) / "metadata.json").read_text())
    if args.holdout_frac > 0:
        n_hold = int(len(metadata) * args.holdout_frac)
        if n_hold:
            metadata = metadata[:-n_hold]
            print(f"Holding out last {n_hold} clips for evaluation")
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
                           intermediate_dim=args.dim * 3,
                           head_mode=args.head_mode)
    mels0, _ = crop_batch(audios[:1], mel_cfg, args.crop_frames,
                          np.random.default_rng(0))
    variables = vocoder.init(jax.random.PRNGKey(0), mels0)
    params = variables["params"]

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.learning_rate * 1e-2,
        peak_value=args.learning_rate,
        warmup_steps=min(500, max(args.steps // 20, 1)),
        decay_steps=args.steps,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))
    opt_state = tx.init(params)
    # device-resident corpus + K steps per dispatch: per-step batch uploads
    # and dispatch latency through the tunnel were the bottleneck (~1 it/s)
    crop_len = args.crop_frames * mel_cfg.hop_length
    k_steps = max(1, min(args.log_interval, 25))
    step_fn = make_vocoder_superstep(vocoder, tx, mel_cfg, crop_len, k_steps)

    cm = CheckpointManager(args.checkpoint_dir, model_name="vocos",
                           max_checkpoints=3)
    start_step = 0
    info: dict = {}
    if args.resume:
        info = cm.load()
        if info.get("params") is not None:
            params = info["params"]
            # restore Adam moments + schedule position (the adamw count
            # drives the cosine schedule) — without this a resume would
            # retrain at peak LR with zeroed moments. GAN-stage checkpoints
            # carry the GAN generator optimizer instead (stage tag below);
            # those moments belong to g_tx2, not the MR-STFT tx
            if info.get("opt") is not None and info.get("stage") != "gan":
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    jax.tree_util.tree_leaves(info["opt"]),
                )
            start_step = int(info.get("step", 0))
            print(f"Resumed from step {start_step}")

    rng = np.random.default_rng(1)
    t0 = time.monotonic()
    voc_config = {"dim": args.dim, "n_layers": args.n_layers,
                  "intermediate_dim": args.dim * 3,
                  "head_mode": args.head_mode}

    # device-resident corpus for both stages: the host only samples crop
    # start indices; K steps run per dispatch
    import jax.numpy as jnp

    flat_np, offsets, max_starts = pack_corpus(audios, crop_len)
    flat = jnp.asarray(flat_np)
    print(f"Corpus on device: {flat_np.nbytes/1e6:.0f} MB, "
          f"{len(audios)} clips; {k_steps} steps/dispatch", flush=True)

    def sample_starts() -> np.ndarray:
        clips = rng.integers(0, len(audios), size=(k_steps, args.batch_size))
        within = rng.random((k_steps, args.batch_size))
        return (offsets[clips]
                + (within * (max_starts[clips] + 1)).astype(np.int64)
                ).astype(np.int32)

    if args.gan:
        from oron_tts_tpu.models.discriminators import VocoderDiscriminator
        from oron_tts_tpu.train.vocoder import make_gan_superstep

        if start_step < args.gan_start_step:
            # the superstep loop below is all-adversarial; entering it
            # before --gan-start-step would start the GAN stage early
            raise SystemExit(
                f"--gan-start-step {args.gan_start_step} not reached: "
                f"resume checkpoint is at step {start_step}. Run the "
                f"MR-STFT stage (without --gan) up to that step first."
            )
        disc = VocoderDiscriminator()
        _, wavs0 = crop_batch(audios[:1], mel_cfg, args.crop_frames,
                              np.random.default_rng(0))
        d_params = disc.init(jax.random.PRNGKey(1), wavs0)["params"]
        d_tx = optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(args.disc_lr, b1=0.8, b2=0.99))
        d_opt = d_tx.init(d_params)
        g_tx2 = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(args.learning_rate, b1=0.8, b2=0.99))
        g_opt2 = g_tx2.init(params)
        if info.get("stage") == "gan" and info.get("opt") is not None:
            # resuming a GAN-stage run: continue the generator's adversarial
            # Adam moments instead of silently re-zeroing them
            g_opt2 = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(g_opt2),
                jax.tree_util.tree_leaves(info["opt"]),
            )
        gan_step_fn = make_gan_superstep(
            vocoder, disc, g_tx2, d_tx, mel_cfg, crop_len, k_steps
        )
        d_cm = CheckpointManager(args.checkpoint_dir, model_name="vocos_disc",
                                 max_checkpoints=1)
        d_info = d_cm.load() if args.resume else {}
        if d_info.get("params") is not None:
            d_params = d_info["params"]
            if d_info.get("opt") is not None:
                d_opt = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(d_opt),
                    jax.tree_util.tree_leaves(d_info["opt"]),
                )

        step = start_step
        while step < args.steps:
            # the jitted superstep always executes a FULL k_steps window;
            # count what actually ran (--steps rounds up to a whole window)
            # so checkpoint step labels and the schedule position stay honest
            k = k_steps
            params, g_opt2, d_params, d_opt, metrics = gan_step_fn(
                params, g_opt2, d_params, d_opt, flat, sample_starts()
            )
            step += k
            if (step // k_steps) % max(1, args.log_interval // k_steps) == 0 \
                    or step >= args.steps:
                m = np.asarray(metrics)[:k]
                rate = (step - start_step) / (time.monotonic() - t0)
                print(f"step {step}/{args.steps} | g={m[-1, 0]:.4f} "
                      f"d={m[-1, 1]:.4f} mel={m[-1, 2]:.4f} "
                      f"(window mel {np.nanmean(m[:, 2]):.4f}) | "
                      f"gnorm={m[-1, 3]:.2f} | {rate:.1f} it/s", flush=True)
            if step % args.save_interval < k or step >= args.steps:
                m = np.asarray(metrics)[:k]
                cm.save(step, params, opt_state=g_opt2,
                        loss=float(m[-1, 0]), config=voc_config,
                        extra_state={"stage": "gan"})
                d_cm.save(step, d_params, opt_state=d_opt)
        print(f"Done. Use: infer.py --vocoder {cm.latest_checkpoint()}")
        return

    step = start_step
    while step < args.steps:
        k = k_steps  # full window per dispatch — see the GAN loop note
        params, opt_state, losses, gnorms = step_fn(
            params, opt_state, flat, sample_starts()
        )
        step += k
        if (step // k_steps) % max(1, args.log_interval // k_steps) == 0 \
                or step >= args.steps:
            losses = np.asarray(losses)[:k]
            gnorms = np.asarray(gnorms)[:k]
            n_skip = int((~np.isfinite(gnorms)).sum())
            rate = (step - start_step) / (time.monotonic() - t0)
            print(f"step {step}/{args.steps} | loss={losses[-1]:.4f} "
                  f"(window mean {np.nanmean(losses):.4f}) | "
                  f"gnorm={gnorms[-1]:.3f} | skipped={n_skip} | "
                  f"{rate:.1f} it/s", flush=True)
        if step % args.save_interval < k or step >= args.steps:
            cm.save(step, params, opt_state=opt_state,
                    loss=float(np.asarray(losses)[:k][-1]),
                    config=voc_config)
    print(f"Done. Use: infer.py --vocoder "
          f"{cm.latest_checkpoint()}")


if __name__ == "__main__":
    main()
