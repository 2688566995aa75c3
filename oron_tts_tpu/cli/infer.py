"""Inference CLI for OronTTS-TPU (flag parity with the reference infer.py)."""

import argparse
from pathlib import Path


def load_model(checkpoint_path: str, use_ema: bool = True,
               scan_blocks: bool | None = None,
               precision: str | None = None,
               quantize: str | None = None):
    """Load F5TTS from a native .npz / torch .pt checkpoint or a directory.

    scan_blocks=True iterates the DiT blocks with lax.scan — identical
    numerics, ~depth× faster cold compile (recommended for serving);
    None defers to the checkpoint config's model.scan_blocks.
    quantize: "int8" (w8a16, near-lossless) or "int8_dynamic" (w8a8,
    int8 MXU at 2x bf16 peak) converts the hot DiT projections to int8
    in memory after loading (F5TTS.quantize_for_serving).
    precision: None = the F5TTS default (bf16 compute on TPU, f32 on CPU);
    "float32" forces f32 compute everywhere. Under bf16 compute, loaded
    params are STORED bf16 too — the compute path casts them to bf16 at
    use anyway, so outputs are identical while weight HBM and per-forward
    weight bandwidth halve (~856 MB and ~2x on the B=1 latency path for
    Base).
    """
    import jax.numpy as jnp

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.train.checkpoint import CheckpointManager, load_pytree_npz

    path = Path(checkpoint_path)
    if not path.exists():
        raise SystemExit(
            f"error: checkpoint path does not exist: {path}\n"
            "Pass a checkpoint directory (with f5tts_step_*.npz + config.json) "
            "or a .npz/.pt/.safetensors file."
        )
    ckpt_dir = path if path.is_dir() else path.parent
    cm = CheckpointManager(str(ckpt_dir))
    config = cm.load_config() or {}
    dtype = jnp.float32 if precision == "float32" else None
    model = F5TTS.from_config(F5Config.from_dict(config),
                              scan_blocks=scan_blocks, dtype=dtype)
    # calibrated ref-free duration table, written into config.json at
    # training time (data/duration_stats.py); absent → reference chars*13
    model.set_duration_stats(config.get("duration_stats"))

    if path.is_dir():
        found = cm.latest_checkpoint() or (
            cm.best_path() if cm.best_path().exists() else None
        )
        if found is None:
            raise FileNotFoundError(f"no checkpoint found in {path}")
        path = found

    if path.suffix == ".npz":
        trees, meta = load_pytree_npz(path)
        params = trees.get("ema") if use_ema and trees.get("ema") is not None \
            else trees.get("params")
        if use_ema and trees.get("ema") is None:
            print("[WARN] EMA weights not found in checkpoint, using raw weights")
        elif use_ema:
            print("Loading EMA weights (smoothed)")
        else:
            print("Loading raw training weights (--no-ema)")
        model.variables = {"params": params}
        print(f"Checkpoint step: {meta.get('step', '?')}")
    else:  # torch .pt / .safetensors from the reference implementation
        from oron_tts_tpu.utils.torch_compat import (
            convert_f5tts_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(str(path), prefer_ema=use_ema)
        params = convert_f5tts_state_dict(
            sd, depth=model.config.model.depth,
            conv_layers=model.config.model.conv_layers,
        )
        model.variables = {"params": params}
        print(f"Loaded torch-format checkpoint ({'EMA' if use_ema else 'raw'} weights, converted to JAX)")
    if model.dtype == jnp.bfloat16:
        import jax

        model.variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            model.variables,
        )
        print("Params stored bf16 (identical outputs under bf16 compute; "
              "halves weight HBM + bandwidth) — use precision='float32' "
              "for f32 end to end")
    if quantize:
        model.quantize_for_serving(quantize)
        print(f"DiT attention/FFN projections quantized for serving: "
              f"{quantize} (in-memory only; checkpoint unchanged)")
        if quantize == "int8":
            print("WARNING: int8 (w8a16) is a MEMORY lever, not a speed "
                  "lever — measured +31% solve time at the standard Base "
                  "serving bucket vs bf16 (docs/KERNELS.md ablation). For "
                  "speed use --quantize int8_dynamic (w8a8, −18%).")
    return model


def main() -> None:
    parser = argparse.ArgumentParser(description="OronTTS F5-TTS Inference (TPU)")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to .npz/.pt checkpoint or checkpoint dir")
    parser.add_argument("--text", type=str, default=None,
                        help="Cyrillic text to synthesize")
    parser.add_argument("--text-file", type=str, default=None,
                        help="File with one utterance per line — batched "
                             "synthesis, outputs <output-stem>_000.wav ...")
    parser.add_argument("--lang", type=str, default="mn", choices=["mn", "kz"])
    parser.add_argument("--output", type=str, default="output.wav")
    parser.add_argument("--ref-audio", type=str, default=None,
                        help="3-10 s reference WAV for voice cloning")
    parser.add_argument("--ref-text", type=str, default=None,
                        help="Transcript of ref-audio clip")
    parser.add_argument("--steps", type=int, default=32,
                        help="ODE integration steps")
    parser.add_argument("--cfg-strength", type=float, default=2.0,
                        help="Classifier-free guidance")
    parser.add_argument("--sway-sampling-coef", type=float, default=-1.0,
                        help="Sway sampling coefficient; use 0 for uniform")
    parser.add_argument("--ode-method", type=str, default="euler",
                        choices=["euler", "midpoint"],
                        help="ODE solver: euler (reference behavior) or "
                             "midpoint (2nd order; 2x DiT forwards per "
                             "step — use ~half the steps for the same "
                             "NFE with lower truncation error)")
    parser.add_argument("--cfg-interval", type=str, default=None,
                        metavar="LO,HI",
                        help="Apply classifier-free guidance only at "
                             "timesteps t in [LO,HI] (e.g. 0.0,0.75); "
                             "other steps run a single cond-only forward "
                             "(~2x cheaper per step). Default: guide "
                             "every step like the reference")
    parser.add_argument("--duration", type=float, default=None,
                        help="Target duration in seconds")
    parser.add_argument("--speed", type=float, default=1.0,
                        help="Speaking-rate multiplier; ignored if --duration set")
    parser.add_argument("--max-chars-per-chunk", type=int, default=120,
                        help="Split long text into chunks; 0 disables chunking")
    parser.add_argument("--pause-ms", type=int, default=250,
                        help="Silence between chunks")
    parser.add_argument("--seed", type=int, default=None,
                        help="Optional reproducible sampling seed")
    parser.add_argument("--no-ema", action="store_true",
                        help="Use raw weights instead of EMA")
    parser.add_argument("--vocoder", type=str, default=None,
                        help="Vocoder checkpoint (.npz or torch Vocos)")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform override (cpu/tpu)")
    parser.add_argument("--scan-blocks", action="store_true", default=None,
                        help="Iterate DiT blocks with lax.scan: identical "
                             "output, ~depth× faster cold compile")
    parser.add_argument("--fp32", action="store_true",
                        help="Force float32 compute + params (default: "
                             "bf16 on TPU — the measured configuration)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip serving mesh as DPxTP (e.g. 2x4): "
                             "batch rows shard over DP, attention/FFN "
                             "projections over TP")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8", "int8_dynamic"],
                        help="Serve the DiT projections in int8: 'int8' = "
                             "w8a16 (near-lossless, halves weight HBM; "
                             "single-device), 'int8_dynamic' = w8a8 (int8 "
                             "MXU at 2x bf16 peak; composes with --mesh)")
    args = parser.parse_args()
    from oron_tts_tpu.cli import validate_quantize_mesh

    validate_quantize_mesh(parser, args.quantize, args.mesh)
    cfg_interval = None
    if args.cfg_interval:
        try:
            lo, hi = (float(v) for v in args.cfg_interval.split(","))
        except ValueError:
            parser.error("--cfg-interval must be LO,HI (e.g. 0.0,0.75)")
        if not 0.0 <= lo <= hi:
            parser.error("--cfg-interval needs 0 <= LO <= HI")
        cfg_interval = (lo, hi)

    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)

    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from oron_tts_tpu.data.wav import write_wav
    from oron_tts_tpu.models.f5tts import split_text_for_synthesis

    if (args.text is None) == (args.text_file is None):
        parser.error("provide exactly one of --text or --text-file")
    if args.text_file and args.duration:
        parser.error(
            "--duration is per-utterance — use --text for an explicit "
            "duration (--text-file estimates per line)"
        )

    model = load_model(args.checkpoint, use_ema=not args.no_ema,
                       scan_blocks=args.scan_blocks,
                       precision="float32" if args.fp32 else None,
                       quantize=args.quantize)
    if args.vocoder:
        model.load_vocoder(args.vocoder)
    if args.mesh:
        from oron_tts_tpu.parallel.mesh import mesh_from_spec

        mesh = mesh_from_spec(args.mesh)
        model.set_mesh(mesh)
        print(f"Serving mesh: {dict(mesh.shape)}")
    print(f"Model loaded. Parameters: {model.num_params():,}")

    if args.text_file:
        texts = [
            line.strip() for line in Path(args.text_file).read_text().splitlines()
            if line.strip()
        ]
        print(f"Batch synthesis: {len(texts)} utterances [{args.lang}]")
        # synthesize_batch chunks long lines itself (each chunk becomes a
        # length-grouped row) and clones one voice across the batch when a
        # reference is given
        wavs = model.synthesize_batch(
            texts, lang=args.lang, n_steps=args.steps,
            cfg_strength=args.cfg_strength,
            sway_sampling_coef=args.sway_sampling_coef,
            speed=args.speed, seed=args.seed,
            max_chars_per_chunk=args.max_chars_per_chunk,
            pause_s=args.pause_ms / 1000,
            ref_audio_path=args.ref_audio, ref_text=args.ref_text,
            cfg_interval=cfg_interval, method=args.ode_method,
        )
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        for i, wav in enumerate(wavs):
            path = out.with_name(f"{out.stem}_{i:03d}{out.suffix or '.wav'}")
            write_wav(path, wav, model.sample_rate)
            print(f"Saved: {path} ({len(wav) / model.sample_rate:.2f} s)")
        return

    print(f"Synthesising [{args.lang}]: {args.text}")
    if args.max_chars_per_chunk > 0:
        chunks = split_text_for_synthesis(args.text, args.max_chars_per_chunk)
        if len(chunks) > 1:
            print(
                f"Long text split into {len(chunks)} chunks "
                f"(max {args.max_chars_per_chunk} chars each)"
            )
    waveform = model.synthesize(
        text=args.text,
        lang=args.lang,
        ref_audio_path=args.ref_audio,
        ref_text=args.ref_text,
        n_steps=args.steps,
        cfg_strength=args.cfg_strength,
        sway_sampling_coef=args.sway_sampling_coef,
        target_duration_s=args.duration,
        speed=args.speed,
        max_chars_per_chunk=args.max_chars_per_chunk,
        pause_s=args.pause_ms / 1000,
        seed=args.seed,
        cfg_interval=cfg_interval,
        method=args.ode_method,
    )

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_wav(out, waveform, model.sample_rate)
    print(f"Saved: {out} ({len(waveform) / model.sample_rate:.2f} s)")


if __name__ == "__main__":
    main()
