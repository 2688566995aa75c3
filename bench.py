"""Benchmark: Base-config synthesis RTF + train-step MFU on one TPU chip.

Prints ONE JSON line whose headline is the synthesis RTF
({"metric", "value", "unit", "vs_baseline"}) with the fast-lever RTF
(rtf_fast_levers: w8a8 int8 + guidance interval), batched-serving
throughput (serve_utts_per_s, serve_audio_s_per_s) and training-step
measurements (train_step_ms, train_frames_per_s, train_audio_s_per_s,
train_mfu, train_vs_ref) as extra keys.

Baselines:
- RTF target (BASELINE.md): < 0.05 per v5e chip for Base DiT (dim=1024,
  depth=22), 32 Euler steps with CFG (64 DiT forwards), 24 kHz output.
  vs_baseline = 0.05 / measured_rtf (>1 = beating the target).
- Training: the reference's only figure is ~15 min/epoch for 3,846 MBSpeech
  samples on an L40S (/root/reference/README.md:299) = 4.27 samples/s
  ≈ 22.6 audio-seconds/s at the ~5.3 s mean clip length implied by the
  companion common-voices set (7.53 h / 5,015 rows, README.md:259).
  train_vs_ref = measured audio-s/s ÷ 22.6.

The measured pipeline is the production path: stretched text ids → CFG
Euler sampler (bf16 DiT, jitted, text embeddings hoisted) → Vocos decode →
host transfer; the train step is the fused donated loss+grad+AdamW+EMA step
at the single-chip fast-path bucket (B=12, T=2048 ≈ 24.6k frames, bf16,
lanes flash attention fwd + stats-reusing bwd, no remat, bf16 Adam mu —
the configuration `gradient_checkpointing: auto` picks when the bucket
fits HBM; see docs/KERNELS.md "Base train step").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

TARGET_RTF = 0.05


def random_params_like(shapes, seed: int = 0, scale: float = 0.02):
    """On-device random params for a flax shape tree (no host gen/upload).

    One jitted generator materializes the whole tree on the device:
    "scale" leaves (LayerNorm) get ones, other vectors get zeros (biases),
    matrices/kernels get N(0, scale²). The generator executable is
    persistently cacheable, so this replaces the old host-side numpy
    generation + ~1.7 GB device_put through the tunnel (~30 s of the
    measured Base cold start, docs/KERNELS.md "Cold start").
    """
    import jax
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def gen(key):
        leaves = []
        for i, (path, s) in enumerate(flat):
            name = str(path[-1]) if path else ""
            if "scale" in name:
                leaves.append(jnp.ones(s.shape, s.dtype))
            elif len(s.shape) >= 2:
                sub = jax.random.fold_in(key, i)
                leaves.append(
                    (jax.random.normal(sub, s.shape) * scale).astype(s.dtype)
                )
            else:
                leaves.append(jnp.zeros(s.shape, s.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return jax.jit(gen)(jax.random.PRNGKey(seed))


def force_sync(*trees) -> None:
    """Force queued device work to really finish (lazy-backend honest).

    On the axon tunnel ``block_until_ready`` is a no-op, so param
    generation and input creation stay queued until the first scalar
    fetch — which would otherwise land inside the timed
    "compile+first-run" window and misattribute tens of seconds of setup
    (plus the tunnel's occasional 30-230 s first-interaction stall) to
    the compile phase. Fetching one tiny scalar per tree flushes it.
    """
    import jax
    import jax.numpy as jnp

    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree)[:1]:
            float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))


def _backend_watchdog(timeout_s: float = 300.0):
    """Fail fast if backend init hangs (the TPU tunnel dials forever when
    it is down — an indefinite hang would eat the whole bench window).
    Returns an Event to set once the backend is up."""
    import os
    import threading

    up = threading.Event()

    def guard() -> None:
        if not up.wait(timeout_s):
            print(
                f"# FATAL: backend init did not complete within "
                f"{timeout_s:.0f}s — TPU tunnel down? (bare jax.devices() "
                f"hangs when it is; see .claude/skills/verify/SKILL.md)",
                file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=guard, daemon=True).start()
    return up


def _cache_file_count() -> int:
    """Entries in the persistent XLA cache dir (miss-written proxy)."""
    import os

    d = None
    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
    except Exception:
        pass
    if not d or not Path(d).is_dir():
        return 0
    return sum(1 for _ in Path(d).iterdir())


def _phase_reset(jax, label: str) -> None:
    """Free the previous phase's device residue before the next one.

    Drops Python-side jit caches + collects garbage, then reports what is
    STILL live on the device — the round-4 driver bench OOMed in the train
    phase because serve-phase residue fragmented HBM (BENCH_r04 rc=1);
    this makes any such residue visible in the bench log and gives the
    allocator back every freeable byte first.
    """
    import gc

    gc.collect()
    jax.clear_caches()
    gc.collect()
    try:
        live = jax.live_arrays()
        total = sum(int(a.size) * a.dtype.itemsize for a in live) / 1e9
        print(f"# {label}: live device arrays={len(live)} ({total:.2f} GB)",
              file=sys.stderr)
    except Exception:
        pass


def main() -> None:
    import argparse
    import os

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--cold-cache", action="store_true",
        help="Run against an empty temporary XLA compilation cache instead "
             "of the persistent one, so setup/warmup timings measure true "
             "cold compiles (r3 vs r4 driver runs swung 4-14x on cache "
             "state alone; this mode pins it)")
    args, _unknown = parser.parse_known_args()

    from oron_tts_tpu.utils.cache import enable_compilation_cache

    if args.cold_cache:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="oron-bench-cold-xla-")
        os.environ["JAX_COMPILATION_CACHE_DIR"] = tmp
        print(f"# cold-cache mode: XLA cache at {tmp}", file=sys.stderr)
        enable_compilation_cache(tmp)
    else:
        enable_compilation_cache()
    import gc

    import jax
    import jax.numpy as jnp

    watchdog_up = _backend_watchdog()
    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()} "
          f"cache_mode={'cold' if args.cold_cache else 'warm'} "
          f"cache_entries={_cache_file_count()}", file=sys.stderr)
    watchdog_up.set()

    # phases run in their own frames so each one's device buffers (params,
    # jit caches) are freed before the next — the B=12 no-remat train step
    # alone needs ~14.9 of the 15.75 GB HBM, so the fast-lever synthesis
    # pass (an EXTRA Base-scale param cycle) runs LAST: interleaving it
    # before the train phase left enough allocator residue/fragmentation
    # to OOM the eager EMA copy there
    phases = {}

    def run_phase(name, fn, *a, **kw):
        n0, t0 = _cache_file_count(), time.perf_counter()
        out = fn(*a, **kw)
        phases[name] = {"wall_s": round(time.perf_counter() - t0, 1),
                        "cache_writes": _cache_file_count() - n0}
        return out

    rtf = run_phase("synthesis", bench_synthesis, jax, jnp)
    _phase_reset(jax, "post-synthesis")
    serve = run_phase("serving", bench_serving, jax, jnp)
    _phase_reset(jax, "post-serving")
    train = run_phase("train", bench_train_step, jax, jnp)
    _phase_reset(jax, "post-train")
    fast = run_phase("fast_levers", bench_synthesis, jax, jnp,
                     fast_levers=True)
    gc.collect()
    print(f"# phase summary: {json.dumps(phases)}", file=sys.stderr)

    print(json.dumps({
        "metric": "synthesis_rtf_base_32nfe",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "cache_mode": "cold" if args.cold_cache else "warm",
        **fast,
        **serve,
        **train,
    }))


def bench_synthesis(jax, jnp, fast_levers: bool = False):
    """Exact-numerics RTF (fast_levers=False → float) or the composed
    opt-in fast-lever RTF (fast_levers=True → dict) under one protocol."""
    import os

    import numpy as np

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.models.vocos import VocosDecoder

    use_flash = os.environ.get("ORON_BENCH_FLASH", "1") != "0"
    scan_blocks = os.environ.get("ORON_BENCH_SCAN", "1") != "0"
    conv_impl = os.environ.get("ORON_BENCH_CONV", "pallas")
    attn_impl = os.environ.get("ORON_BENCH_IMPL") or None  # lanes/flash/einsum
    # Base config, bf16 compute
    base_kw = dict(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4,
        dropout=0.0, mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=use_flash, scan_blocks=scan_blocks,
        conv_impl=conv_impl, attn_impl=attn_impl,
    )
    model = DiT(**base_kw)
    print(f"# use_flash={use_flash} scan_blocks={scan_blocks} "
          f"conv_impl={conv_impl} attn_impl={attn_impl or 'auto'}",
          file=sys.stderr)
    cfm = CFM(model, CFMConfig())
    vocoder = VocosDecoder(dtype=jnp.bfloat16)

    # 120-char chunk → chars*13 ≈ 1560 frames, bucketed to 1664
    n_steps, cfg_strength, sway = 32, 2.0, -1.0
    t_setup = time.perf_counter()
    t_total = 120 * 13
    bucket = -(-t_total // 64) * 64
    audio_seconds = t_total * 256 / 24000

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    T = bucket
    text = jax.random.randint(k1, (1, T), 0, 65, dtype=jnp.int32)
    # Cold-start-honest param creation: flax init on this backend eagerly
    # runs a Base forward through the tunnel (~95 s), so params are
    # generated ON DEVICE by one jitted generator over the eval_shape tree
    # (see random_params_like). Randomized (zero-init proj_out would make
    # the ODE trivial); "scale" leaves get ones so LayerNorms pass signal.
    variables = random_params_like(
        jax.eval_shape(
            model.init, k2, jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
            jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
        ),
    )
    voc_vars = random_params_like(
        jax.eval_shape(vocoder.init, k2, jnp.zeros((1, 100, 64), jnp.float32)),
    )

    cond = jnp.zeros((1, bucket, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    lens = jnp.asarray([0], jnp.int32)
    noise = jax.random.normal(k3, (1, bucket, 100), jnp.float32)
    force_sync(variables, voc_vars, noise, text)
    print(f"# synthesis setup (params+inputs on device): "
          f"{time.perf_counter() - t_setup:.1f}s", file=sys.stderr)

    if fast_levers:
        # Fast-lever protocol: the two measured-best opt-in serving levers
        # composed — int8_dynamic w8a8 (per-token activation quant + s8×s8
        # int8-MXU dot, 2× bf16 peak) and the guidance interval
        # t∈[0.10,0.70] (CFG's batch-doubled forward only inside the band,
        # arXiv:2404.07724). Same bucket/protocol incl. vocoder decode;
        # reported as rtf_fast_levers so the headline stays the
        # exact-numerics default. Lever numerics pinned by
        # tests/test_quantized.py, tests/test_cfg_interval.py; ablation in
        # docs/KERNELS.md.
        from oron_tts_tpu.models.dit import quantize_dit_params

        qvars = {"params": jax.jit(quantize_dit_params)(variables["params"])}
        force_sync(qvars)
        del variables  # only the int8 copy is needed from here on
        cfm_q = CFM(DiT(**base_kw, quant="int8_dynamic"), CFMConfig())

        @jax.jit
        def synthesize_fast(qvars, voc_vars, cond, text, duration, lens,
                            noise):
            mel, _ = cfm_q.sample(
                qvars, cond, text, duration, lens,
                steps=n_steps, cfg_strength=cfg_strength,
                sway_sampling_coef=sway,
                noise=noise, cfg_interval=(0.10, 0.70),
            )
            mel = jnp.swapaxes(mel[:, :t_total], 1, 2)
            wav = vocoder.apply(voc_vars, mel)
            return wav, jnp.mean(jnp.abs(wav))

        fast_args = (qvars, voc_vars, cond, text, duration, lens, noise)
        t0 = time.perf_counter()
        wav_f, checksum = synthesize_fast(*fast_args)
        float(checksum)
        print(f"# fast-lever compile+first-run: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        fast_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            wav_f, checksum = synthesize_fast(*fast_args)
            float(checksum)
            fast_times.append(time.perf_counter() - t0)
        rtf_fast = min(fast_times) / audio_seconds
        print(
            f"# fast levers (w8a8 + cfg-interval): "
            f"wall={min(fast_times):.3f}s rtf={rtf_fast:.4f} "
            f"runs={[round(t, 3) for t in fast_times]}",
            file=sys.stderr,
        )
        assert bool(np.isfinite(np.asarray(wav_f)).all()), \
            "non-finite fast output"
        synthesize_fast.clear_cache()
        return {"rtf_fast_levers": round(rtf_fast, 5)}

    @jax.jit
    def synthesize(variables, voc_vars, cond, text, duration, lens, noise):
        mel, _ = cfm.sample(
            variables, cond, text, duration, lens,
            steps=n_steps, cfg_strength=cfg_strength, sway_sampling_coef=sway,
            noise=noise,
        )
        mel = jnp.swapaxes(mel[:, :t_total], 1, 2)
        wav = vocoder.apply(voc_vars, mel)
        # scalar checksum: fetching it forces full execution even on backends
        # whose block_until_ready is a no-op (the axon tunnel)
        return wav, jnp.mean(jnp.abs(wav))

    args = (variables, voc_vars, cond, text, duration, lens, noise)

    def timed_run():
        t0 = time.perf_counter()
        wav, checksum = synthesize(*args)
        float(checksum)  # device→host sync
        return time.perf_counter() - t0, wav

    compile_s, wav = timed_run()
    print(f"# compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        dt, wav = timed_run()
        times.append(dt)
    best = min(times)
    rtf = best / audio_seconds
    print(
        f"# wall={best:.3f}s audio={audio_seconds:.2f}s "
        f"runs={[round(t, 3) for t in times]}", file=sys.stderr,
    )
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"
    # release this phase's executables + buffers before the next phase
    synthesize.clear_cache()
    return rtf


def bench_serving(jax, jnp) -> dict:
    """Batched-serving throughput (VERDICT r2 #8): a realistic length mix
    through F5TTS.synthesize_batch — length-grouped buckets, one CFG solve
    and ONE jitted vocoder call per group. Reports utterances/s and
    audio-seconds generated per wall second on one chip."""
    import numpy as np

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.models.vocos import VocosDecoder

    cfg = {
        "sample_rate": 24000, "n_mels": 100, "n_fft": 1024, "hop_length": 256,
        "model": {
            "dim": 1024, "depth": 22, "heads": 16, "dim_head": 64,
            "ff_mult": 4, "text_dim": 512, "conv_layers": 4, "vocab_size": 65,
            "p_dropout": 0.0, "scan_blocks": True,
        },
    }
    model = F5TTS(F5Config.from_dict(cfg), dtype=jnp.bfloat16)
    model.variables = random_params_like(
        jax.eval_shape(
            model.backbone.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
            jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
        ), seed=2,
    )
    vocoder = VocosDecoder(dtype=jnp.bfloat16)
    voc_vars = random_params_like(
        jax.eval_shape(vocoder.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 100, 64), jnp.float32)),
    )
    model.set_vocoder(vocoder, voc_vars)
    force_sync(model.variables, voc_vars)

    # realistic request mix: 16 utterances, 25–120 chars (≈ 3.5–17 s audio)
    words = ("сайн байна уу та нар өнөөдөр хэрхэн байна вэ монгол улс "
             "сайхан орон юм шүү өргөн уудам тал нутаг").split()
    rng = np.random.default_rng(0)
    texts = []
    for i in range(16):
        target_chars = 25 + int(rng.integers(0, 96))
        t = ""
        while len(t.replace(" ", "")) < target_chars:
            t += words[int(rng.integers(0, len(words)))] + " "
        texts.append(t.strip())
    audio_s = sum(
        max(50, int(len(t.replace(" ", "")) * 13)) * 256 / 24000 for t in texts
    )

    t0 = time.perf_counter()
    model.synthesize_batch(texts, n_steps=32, seed=0)
    warm = time.perf_counter() - t0
    print(f"# serve warmup (compile incl.): {warm:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    wavs = model.synthesize_batch(texts, n_steps=32, seed=0)
    wall = time.perf_counter() - t0
    assert all(np.isfinite(w).all() for w in wavs)
    print(
        f"# serve: {len(texts)} utts ({audio_s:.1f} audio-s) in {wall:.2f}s "
        f"-> {len(texts) / wall:.1f} utts/s, {audio_s / wall:.1f} audio-s/s",
        file=sys.stderr,
    )
    return {
        "serve_utts_per_s": round(len(texts) / wall, 2),
        "serve_audio_s_per_s": round(audio_s / wall, 1),
        "serve_batch": len(texts),
    }


def dit_train_flops(
    B: int, T: int, dim: int = 1024, depth: int = 22, heads: int = 16,
    dim_head: int = 64, ff_mult: int = 4, mel_dim: int = 100,
    text_dim: int = 512, conv_layers: int = 4,
) -> float:
    """Analytic model FLOPs for one fwd+bwd (3x forward, matmul-dominated).

    Counts only MXU work (matmuls/attention/convs); elementwise is free by
    convention. Remat recompute is NOT counted (standard MFU definition).
    """
    bt = B * T
    per_block = (
        8 * bt * dim * dim                    # q,k,v,out projections
        + 4 * B * heads * T * T * dim_head    # QK^T + PV
        + 4 * bt * dim * dim * ff_mult        # FFN in+out
        + 2 * B * dim * 6 * dim               # AdaLN modulation
    )
    text_embed = conv_layers * (
        2 * bt * text_dim * 7                 # depthwise conv k=7
        + 4 * bt * text_dim * 2 * text_dim    # pw1+pw2 (inter = 2*text_dim)
    )
    input_embed = (
        2 * bt * (2 * mel_dim + text_dim) * dim   # concat projection
        + 2 * (2 * bt * dim * (dim // 16) * 31)   # convpos k=31 groups=16
    )
    final = 2 * bt * dim * mel_dim + 2 * bt * dim * 2 * dim  # proj + AdaLN-f
    fwd = depth * per_block + text_embed + input_embed + final
    return 3.0 * fwd  # bwd = 2x fwd


def bench_train_step(jax, jnp) -> dict:
    """Fused Base-config train step at a production bucket; returns metrics.

    Env knobs for ablations (docs/KERNELS.md "Base train step"):
    ORON_TRAIN_B / ORON_TRAIN_T (bucket), ORON_TRAIN_REMAT (1/0),
    ORON_TRAIN_IMPL (lanes/flash/einsum), ORON_TRAIN_MU (bf16/f32).

    Defensive on HBM pressure (BENCH_r04 rc=1: the no-remat step OOMed at
    the AOT state relayout after the serve phase): if the fused no-remat
    configuration cannot allocate, the phase retries ONCE with per-block
    remat (smaller live set, ~10% slower) and reports which ran via
    ``train_remat``.
    """
    import os

    remat = os.environ.get("ORON_TRAIN_REMAT", "0") != "0"
    try:
        return _bench_train_once(jax, jnp, remat)
    except Exception as exc:  # noqa: BLE001 — only OOM is retried
        if "RESOURCE_EXHAUSTED" not in str(exc) or remat:
            raise
        print("# train phase OOMed without remat; retrying with per-block "
              "remat", file=sys.stderr)
    # retry OUTSIDE the except block: the exception's traceback pins the
    # failed attempt's frames (and through them its ~7 GB device state)
    # until the handler exits — resetting/reallocating inside it would
    # fight the very buffers being retried around
    _phase_reset(jax, "train-oom-retry")
    return _bench_train_once(jax, jnp, remat=True)


def _bench_train_once(jax, jnp, remat: bool) -> dict:
    import os

    import numpy as np

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.train.trainer import (
        TrainState,
        compile_train_step_auto,
        make_lr_schedule,
        make_optimizer,
    )

    # default = the trainer's auto-selected fast path on one 16 GB chip:
    # 24,576 frames (the per-chip share of the reference's 48k frame
    # budget at dp=2) fits HBM without remat thanks to the lanes-layout
    # attention + bf16 Adam mu (utils/memory.py; docs/KERNELS.md table)
    B = int(os.environ.get("ORON_TRAIN_B", 12))
    T = int(os.environ.get("ORON_TRAIN_T", 2048))
    impl = os.environ.get("ORON_TRAIN_IMPL", "lanes")
    mu_bf16 = os.environ.get("ORON_TRAIN_MU", "bf16") == "bf16"
    print(f"# train config: B={B} T={T} remat={remat} impl={impl} "
          f"mu_bf16={mu_bf16}", file=sys.stderr)
    model = DiT(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4, dropout=0.1,
        mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=True, attn_impl=impl,
        gradient_checkpointing=remat,
    )
    cfm = CFM(model, CFMConfig())
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    variables = random_params_like(
        jax.eval_shape(
            model.init, k1, jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
            jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
        ), seed=1,
    )
    # flush generation so the tunnel's first-interaction stall (30-230 s,
    # see force_sync) cannot land inside the timed compile+first-step;
    # opt_state/EMA stay lazy — materializing them early doubles resident
    # state across the AOT relayout and OOMs the 15.75 GB chip at B=12
    force_sync(variables)

    tx = make_optimizer(make_lr_schedule(1e-4, 1000, 100000),
                        mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    params = variables["params"]
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.asarray(0, jnp.int32),
        ema_updates=jnp.asarray(0, jnp.int32),
    )
    n_params = sum(
        np.prod(a.shape) for a in jax.tree_util.tree_leaves(params)
    )
    # drop the pre-relayout param references: the on-device generated
    # arrays carry compiler-chosen layouts, so the AOT AUTO-layout compile
    # below really copies state — keeping the originals alive through the
    # first step costs +1.7 GB and OOMs the B=12 no-remat configuration
    del variables, params
    import gc as _gc
    _gc.collect()

    lens = np.full((B,), T, np.int32)
    lens[B // 2:] = int(T * 0.83)
    batch = {
        "mel": jax.random.normal(k2, (B, 100, T), jnp.float32) * 0.5,
        "text_ids": jax.random.randint(k3, (B, T), 0, 65, dtype=jnp.int32),
        "mel_lengths": jnp.asarray(lens),
    }
    # AOT AUTO-layout compile: ONE executable whose donated state
    # input/output layouts match, so the old "donation recompile" phase
    # (52-315 s, VERDICT r2 #4) no longer exists
    t0 = time.perf_counter()
    step, state, _ = compile_train_step_auto(
        cfm, tx, 0.9999, state, batch, k1
    )
    state, metrics = step(state, batch, k1)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    print(f"# train compile+first-step: {compile_s:.1f}s loss={loss0:.3f}",
          file=sys.stderr)
    # one more step to confirm the aliased feedback call reuses the
    # executable (it is timed: a recompile here would show as a huge step)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.fold_in(k1, 999))
    float(metrics["loss"])
    print(f"# train second step (no recompile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(k1, i))
    loss = float(metrics["loss"])  # forces completion (axon lazy exec)
    step_s = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss), "non-finite train loss"

    frames = B * T
    frames_per_s = frames / step_s
    audio_s_per_s = frames * 256 / 24000 / step_s
    flops = dit_train_flops(B, T)
    peak = float(__import__("os").environ.get("ORON_TPU_PEAK_TFLOPS", 197)) * 1e12
    mfu = flops / step_s / peak
    ref_audio_s_per_s = 22.6  # L40S, see module docstring
    print(
        f"# train: {step_s*1e3:.0f} ms/step {frames} frames "
        f"({n_params/1e6:.0f}M params) -> {frames_per_s:,.0f} frames/s, "
        f"{audio_s_per_s:.0f} audio-s/s, MFU {mfu*100:.1f}%",
        file=sys.stderr,
    )
    return {
        "train_step_ms": round(step_s * 1e3, 1),
        "train_frames_per_s": round(frames_per_s),
        "train_audio_s_per_s": round(audio_s_per_s, 1),
        "train_mfu": round(mfu, 4),
        "train_vs_ref": round(audio_s_per_s / ref_audio_s_per_s, 1),
        "train_remat": remat,
    }


if __name__ == "__main__":
    main()
