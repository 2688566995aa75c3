#!/usr/bin/env python
"""Decompose the Base train step's wall time (VERDICT r3 #2 roofline).

Each phase runs in its OWN subprocess so HBM is clean per measurement
(state + grads + activations do not fit 15.75 GB simultaneously at Base
scale, and the tunnel surfaces OOM as deferred opaque errors). Phases:

- fused:  the shipped AOT train step at B=12 T=2048 (bf16 lanes, no
          remat, bf16 mu) + the optimizer+EMA update alone
- fwd:    forward loss only (cfm.loss)
- bwd:    forward+backward (value_and_grad, no optimizer)
- attn:   lanes flash-attention fwd and fwd+bwd, depth x
- ffn:    FFN (dim -> ff*dim GELU -> dim) fwd and fwd+bwd, depth x
- proj:   QKV+out dim x dim projections fwd and fwd+bwd, 4*depth x
- h2d:    host->device batch staging

The driver (no --phase) runs them all and prints the markdown table with
measured ms, share of the fused step, matmul-ideal ms at peak bf16
(ORON_TPU_PEAK_TFLOPS, default 197), and implied efficiency.

    python scripts/roofline_train.py                      # TPU, Base
    python scripts/roofline_train.py --device cpu --dim 64 --depth 2 \
        --heads 2 --b 2 --t 256 --steps 1                 # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# "bwd" (standalone value_and_grad) is NOT in the default driver list: at
# Base scale it OOMs a 15.75 GB chip — the fused step only fits because
# whole-state donation lets grads alias the optimizer update in place.
# Backward time is derived instead: bwd = step - update - fwd.
PHASES = ("fused", "fwd", "attn", "ffn", "proj", "h2d")


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--b", type=int, default=12)
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3, help="timed reps (min)")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--phase", choices=PHASES + ("bwd",), default=None)
    ap.add_argument("--out", type=Path, default=None,
                    help="driver mode: also write the table to this file")
    return ap.parse_args()


def _setup(args):
    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    return jax


def _sync(jax, out):
    """Force REAL completion: device_get a scalar reduction of one leaf.

    block_until_ready returns immediately for AOT-executable outputs on
    the axon tunnel backend (measured: a 5.7 ms 'fused step' that bench's
    device_get protocol times at 842 ms) — only a host fetch is a
    trustworthy sync there, matching bench.py's float(loss) protocol."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf.ravel()[0]
    float(jax.device_get(leaf))


def _timeit(jax, fn, *a, reps):
    _sync(jax, fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(jax, fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _model_pieces(args, jax, with_params=True):
    import jax.numpy as jnp

    from bench import random_params_like
    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT

    ff = 4 if args.dim >= 512 else 2
    model = DiT(dim=args.dim, depth=args.depth, heads=args.heads, dim_head=64,
                ff_mult=ff, dropout=args.dropout, mel_dim=100, vocab_size=65,
                text_dim=args.dim // 2, conv_layers=4, dtype=jnp.bfloat16,
                use_flash=True, attn_impl="lanes",
                gradient_checkpointing=False)
    cfm = CFM(model, CFMConfig())
    params = None
    if with_params:
        k1 = jax.random.PRNGKey(0)
        variables = random_params_like(
            jax.eval_shape(model.init, k1, jnp.zeros((1, 64, 100)),
                           jnp.zeros((1, 64, 100)),
                           jnp.zeros((1, 64), jnp.int32),
                           jnp.zeros((1,))), seed=1)
        jax.block_until_ready(variables)
        params = variables["params"]
    return model, cfm, params, ff


def _batch(args, jax, device=True):
    lens = np.full((args.b,), args.t, np.int32)
    lens[args.b // 2:] = int(args.t * 0.83)
    batch = {
        "mel": (np.random.default_rng(0)
                .standard_normal((args.b, 100, args.t)) * 0.5
                ).astype(np.float32),
        "text_ids": np.random.default_rng(1).integers(
            0, 65, (args.b, args.t)).astype(np.int32),
        "mel_lengths": lens,
    }
    if device:
        batch = jax.device_put(batch)
        jax.block_until_ready(batch)
    return batch


def run_phase(args) -> dict:
    jax = _setup(args)
    import jax.numpy as jnp
    from jax import lax

    res: dict[str, float] = {}
    B, T, dim, depth, heads = args.b, args.t, args.dim, args.depth, args.heads

    if args.phase == "fused":
        from oron_tts_tpu.train.trainer import (
            TrainState,
            _guarded_update,
            compile_train_step_auto,
            make_lr_schedule,
            make_optimizer,
        )

        model, cfm, params, ff = _model_pieces(args, jax)
        batch = _batch(args, jax)
        tx = make_optimizer(make_lr_schedule(1e-4, 1000, 100000),
                            mu_dtype=jnp.bfloat16)
        state = TrainState(params=params, opt_state=tx.init(params),
                           ema_params=jax.tree_util.tree_map(jnp.array, params),
                           step=jnp.asarray(0, jnp.int32),
                           ema_updates=jnp.asarray(0, jnp.int32))
        del params
        k2 = jax.random.PRNGKey(2)
        step, state, _ = compile_train_step_auto(cfm, tx, 0.9999, state,
                                                 batch, k2)
        box = [state]

        def fused(_):
            box[0], m = step(box[0], batch, k2)
            return m["loss"]

        res["fused"] = _timeit(jax, fused, None, reps=args.steps)

        # optimizer+EMA alone: dummy grads (= a params-shaped tree); NOT
        # donated, so each timed call reuses the same buffers
        grads = jax.tree_util.tree_map(
            lambda a: (a * 1e-3).astype(a.dtype), box[0].params)
        jax.block_until_ready(grads)
        upd = jax.jit(lambda s, g: _guarded_update(
            s, g, tx, 0.9999, extra_ok=jnp.asarray(True))[0].step)
        res["update"] = _timeit(jax, upd, box[0], grads, reps=args.steps)

    elif args.phase in ("fwd", "bwd"):
        model, cfm, params, ff = _model_pieces(args, jax)
        batch = _batch(args, jax)
        k3 = jax.random.PRNGKey(3)

        def loss(p, b):
            return cfm.loss({"params": p}, b["mel"], b["text_ids"],
                            b["mel_lengths"], k3, train=True)

        if args.phase == "fwd":
            res["fwd"] = _timeit(jax, jax.jit(loss), params, batch,
                                 reps=args.steps)
        else:
            # scalar output (grad norm) + donated params: lets XLA free
            # grad buffers progressively and reuse the params' 1.7 GB —
            # without this the standalone grad phase OOMs at Base even
            # though the fused step (which donates the whole state) fits
            from oron_tts_tpu.train.trainer import _global_norm

            g = jax.jit(
                lambda p, b: _global_norm(jax.value_and_grad(
                    lambda q: loss(q, b))(p)[1]),
                donate_argnums=(0,),
            )
            res["bwd_total"] = _timeit(jax, lambda b: g(
                jax.tree_util.tree_map(jnp.array, params), b), batch,
                reps=args.steps)

    elif args.phase == "attn":
        from oron_tts_tpu.ops.flash_attention import flash_attention_lanes

        interp = jax.default_backend() == "cpu"
        hd = heads * 64
        q = jax.device_put(jnp.asarray(
            np.random.default_rng(2).standard_normal((B, T, hd)),
            jnp.bfloat16))
        lens = np.full((B,), T, np.int32)
        lens[B // 2:] = int(T * 0.83)
        kv_lens = jax.device_put(jnp.asarray(lens))

        def attn_fwd(x):
            def body(acc, _):
                return flash_attention_lanes(acc, x, x, kv_lens, heads,
                                             interp), None
            out, _ = lax.scan(body, x, None, length=depth)
            return out

        res["attn_fwd"] = _timeit(jax, jax.jit(attn_fwd), q, reps=args.steps)
        res["attn_grad"] = _timeit(
            jax, jax.jit(jax.grad(
                lambda x: attn_fwd(x).astype(jnp.float32).sum())), q,
            reps=args.steps)

    elif args.phase == "ffn":
        model, cfm, params, ff = _model_pieces(args, jax, with_params=False)
        w1 = jax.device_put(jnp.asarray(
            np.random.default_rng(3).standard_normal((dim, ff * dim)) * 0.02,
            jnp.bfloat16))
        w2 = jax.device_put(jnp.asarray(
            np.random.default_rng(4).standard_normal((ff * dim, dim)) * 0.02,
            jnp.bfloat16))
        x = jax.device_put(jnp.asarray(
            np.random.default_rng(5).standard_normal((B * T, dim)),
            jnp.bfloat16))

        def ffn(x, n):
            def body(acc, _):
                h = jax.nn.gelu(acc @ w1)
                return (h @ w2).astype(acc.dtype), None
            out, _ = lax.scan(body, x, None, length=n)
            return out

        res["ffn_fwd"] = _timeit(jax, jax.jit(lambda y: ffn(y, depth)), x,
                                 reps=args.steps)
        # grad residuals are depth x [B*T, ff*dim] (~22 GB at Base) — time
        # a 4-layer chunk and scale linearly (per-layer work is identical)
        chunk = min(depth, 4)
        ms = _timeit(jax, jax.jit(jax.grad(
            lambda y: ffn(y, chunk).astype(jnp.float32).sum())), x,
            reps=args.steps)
        res["ffn_grad"] = ms * depth / chunk

    elif args.phase == "proj":
        wp = jax.device_put(jnp.asarray(
            np.random.default_rng(6).standard_normal((dim, dim)) * 0.02,
            jnp.bfloat16))
        x = jax.device_put(jnp.asarray(
            np.random.default_rng(7).standard_normal((B * T, dim)),
            jnp.bfloat16))

        def proj(x, n):
            def body(acc, _):
                return (acc @ wp).astype(acc.dtype), None
            out, _ = lax.scan(body, x, None, length=n)
            return out

        res["proj_fwd"] = _timeit(jax, jax.jit(lambda y: proj(y, 4 * depth)),
                                  x, reps=args.steps)
        chunk = min(4 * depth, 16)
        ms = _timeit(jax, jax.jit(jax.grad(
            lambda y: proj(y, chunk).astype(jnp.float32).sum())), x,
            reps=args.steps)
        res["proj_grad"] = ms * (4 * depth) / chunk

    elif args.phase == "h2d":
        host = _batch(args, jax, device=False)
        res["h2d"] = _timeit(jax, lambda _: jax.device_put(host), None,
                             reps=args.steps)

    return res


def main() -> None:
    args = parse_args()
    if args.phase:
        out = run_phase(args)
        print("PHASE_RESULT " + json.dumps(out))
        return

    # driver: each phase in its own process (clean HBM), aggregate
    results: dict[str, float] = {}
    for phase in PHASES:
        cmd = [sys.executable, __file__, "--phase", phase,
               "--b", str(args.b), "--t", str(args.t), "--dim", str(args.dim),
               "--depth", str(args.depth), "--heads", str(args.heads),
               "--steps", str(args.steps)]
        if args.device:
            cmd += ["--device", args.device]
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=str(REPO_ROOT), timeout=3600)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("PHASE_RESULT ")), None)
        if proc.returncode != 0 or line is None:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"phase {phase} failed rc={proc.returncode}")
        results.update(json.loads(line[len("PHASE_RESULT "):]))
        print(f"# phase {phase}: {json.dumps(json.loads(line[13:]))} "
              f"({time.time() - t0:.0f}s incl. compile)", flush=True)

    from bench import dit_train_flops

    B, T, dim, depth, heads = args.b, args.t, args.dim, args.depth, args.heads
    ff = 4 if dim >= 512 else 2
    peak = float(os.environ.get("ORON_TPU_PEAK_TFLOPS", 197)) * 1e12
    flops_total = dit_train_flops(B, T, dim=dim, depth=depth, heads=heads,
                                  dim_head=64, ff_mult=ff, text_dim=dim // 2)
    attn_f = depth * 4 * B * heads * T * T * 64
    ffn_f = depth * 4 * B * T * dim * dim * ff
    proj_f = depth * 8 * B * T * dim * dim
    step_ms = results["fused"]
    mfu = flops_total / (step_ms / 1e3) / peak
    bwd_ms = step_ms - results["update"] - results["fwd"]

    lines = []
    lines.append(f"fused step {step_ms:.0f} ms -> MFU {mfu * 100:.1f}% "
                 f"(analytic {flops_total / 1e12:.1f} TFLOP, "
                 f"peak {peak / 1e12:.0f} TFLOP/s)")
    lines.append(f"derived: bwd = step - update - fwd = {bwd_ms:.0f} ms "
                 f"({bwd_ms / results['fwd']:.2f}x fwd; FLOP model says 2x)")
    lines.append("")
    lines.append("| component | ms | % of step | matmul-ideal ms | efficiency |")
    lines.append("|---|---|---|---|---|")

    def row(name, ms, ideal=None):
        eff = f"{ideal / ms * 100:.0f}%" if ideal else "—"
        ideal_s = f"{ideal:.0f}" if ideal is not None else "—"
        lines.append(f"| {name} | {ms:.1f} | {ms / step_ms * 100:.0f}% | "
                     f"{ideal_s} | {eff} |")

    row("fused train step", step_ms, flops_total / peak * 1e3)
    row("loss forward", results["fwd"], flops_total / 3 / peak * 1e3)
    row("backward (derived)", bwd_ms, 2 * flops_total / 3 / peak * 1e3)
    row("optimizer+EMA update", results["update"])
    row(f"attention fwd x{depth}", results["attn_fwd"], attn_f / peak * 1e3)
    row(f"attention fwd+bwd x{depth}", results["attn_grad"],
        3 * attn_f / peak * 1e3)
    row(f"FFN fwd x{depth}", results["ffn_fwd"], ffn_f / peak * 1e3)
    row(f"FFN fwd+bwd x{depth}", results["ffn_grad"], 3 * ffn_f / peak * 1e3)
    row(f"QKVO projections fwd x{4 * depth}", results["proj_fwd"],
        proj_f / peak * 1e3)
    row(f"QKVO projections fwd+bwd x{4 * depth}", results["proj_grad"],
        3 * proj_f / peak * 1e3)
    row("host->device batch staging", results["h2d"])

    table = "\n".join(lines)
    print("\n" + table)
    if args.out:
        args.out.write_text(table + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
