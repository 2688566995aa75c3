#!/usr/bin/env python
"""Probe achievable MXU throughput on this chip for train-step shapes.

The roofline (docs/KERNELS.md) charges every component against the
datasheet 197 bf16 TFLOP/s; this script measures what fraction of that a
bare jitted matmul chain actually reaches per shape, so kernel targets
chase an achievable ceiling instead of a paper number. Chains are scans
of length N with a bf16 carry (the train step's structure), timed with
the device_get-scalar protocol (block_until_ready lies on the axon
tunnel — see scripts/roofline_train.py:_sync).

    python scripts/sweep_matmul_peak.py             # TPU
    python scripts/sweep_matmul_peak.py --device cpu --small  # smoke
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for CPU smoke")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jax.device_get(leaf.ravel()[0].astype(jnp.float32)))

    def timeit(fn, *a):
        sync(fn(*a))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    if args.small:
        shapes = [("tiny", 256, 64, 64, 4)]
    else:
        # (label, M, K, N, chain length) — sized so each chain runs
        # ~20-80 ms (well above sync overhead)
        shapes = [
            ("square 4k", 4096, 4096, 4096, 8),
            ("ffn in [BT,1024]x[1024,4096]", 24576, 1024, 4096, 8),
            ("ffn out [BT,4096]x[4096,1024]", 24576, 4096, 1024, 8),
            ("proj [BT,1024]x[1024,1024]", 24576, 1024, 1024, 32),
            ("qkv-fused [BT,1024]x[1024,3072]", 24576, 1024, 3072, 11),
            ("qk-like [512,64]x[64,2048]", 512, 64, 2048, 256),
            ("pv-like [512,2048]x[2048,64]", 512, 2048, 64, 256),
            ("dq-like [512,2048]x[2048,128]", 512, 2048, 128, 128),
        ]

    peak = args.peak_tflops * 1e12
    print(f"# backend={jax.default_backend()}")
    print("| shape | ms/chain | TFLOP/s | % of peak |")
    print("|---|---|---|---|")
    for label, M, K, N, n in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        w2 = jax.random.normal(key, (N, K), jnp.bfloat16)

        @jax.jit
        def chain(x, w, w2, n=n):
            def body(acc, _):
                h = lax.dot(acc, w, preferred_element_type=jnp.float32)
                return lax.dot(h.astype(jnp.bfloat16), w2,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16), None

            out, _ = lax.scan(body, x, None, length=n)
            return out

        dt = timeit(chain, x, w, w2)
        flops = 2 * 2 * M * K * N * n
        tf = flops / dt / 1e12
        print(f"| {label} | {dt * 1e3:.1f} | {tf:.1f} | "
              f"{tf / (peak / 1e12) * 100:.0f}% |")


if __name__ == "__main__":
    main()
