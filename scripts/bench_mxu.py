"""Characterize MXU throughput on this chip for attention-shaped matmuls.

Answers: what do the K=64 contraction, the N=64 output, f32 accumulation
output, and per-(batch,head) batching each cost vs a healthy square bf16
matmul? Timing is min-of-repeats over an in-jit scan (axon dispatch
overhead ~1-2 ms/call).

    python scripts/bench_mxu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    ITERS, REPS = 20, 5
    key = jax.random.PRNGKey(0)

    def timed(name: str, flops: int, make_run):
        run = make_run()
        float(run())  # compile + warm
        best = min(
            (lambda t0=time.perf_counter(): (float(run()), time.perf_counter() - t0)[1])()
            for _ in range(REPS)
        )
        dt = best / ITERS
        print(f"{name:56s} {dt*1e3:8.3f} ms   {flops/dt/1e12:6.1f} TFLOP/s")

    def mm_case(name, m, k, n, out_dtype, batch=1):
        a = jax.random.normal(key, (batch, m, k), jnp.bfloat16) if batch > 1 \
            else jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (batch, k, n), jnp.bfloat16) if batch > 1 \
            else jax.random.normal(key, (k, n), jnp.bfloat16)

        def make_run():
            @jax.jit
            def run():
                def body(carry, _):
                    # data-depend each iteration's input on the previous
                    # output so XLA cannot hoist the loop-invariant matmul
                    a_dep = a * (1.0 + carry * 1e-24).astype(a.dtype)
                    c = jnp.matmul(a_dep, b, preferred_element_type=out_dtype)
                    return jnp.sum(c.astype(jnp.float32)) * 1e-9, ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
                return acc

            return run

        timed(name, 2 * batch * m * k * n * ITERS, make_run)

    # healthy square matmuls
    mm_case("square 4096^3 bf16 -> bf16", 4096, 4096, 4096, jnp.bfloat16)
    mm_case("square 4096^3 bf16 -> f32", 4096, 4096, 4096, jnp.float32)
    mm_case("square 2048^3 bf16 -> bf16", 2048, 2048, 2048, jnp.bfloat16)

    # model-shaped (the DiT linears at T=1664, CFG batch: M=3328)
    mm_case("dit qkv   [3328,1024]x[1024,1024] -> bf16",
            3328, 1024, 1024, jnp.bfloat16)
    mm_case("dit ff_in [3328,1024]x[1024,4096] -> bf16",
            3328, 1024, 4096, jnp.bfloat16)

    # attention-shaped: K=64 contraction
    mm_case("qk K=64 [1664,64]x[64,1664] -> f32", 1664, 64, 1664, jnp.float32)
    mm_case("qk K=64 [1664,64]x[64,1664] -> bf16", 1664, 64, 1664, jnp.bfloat16)
    mm_case("qk K=64 batched x32 -> f32", 1664, 64, 1664, jnp.float32, batch=32)
    mm_case("qk K=64 batched x32 -> bf16", 1664, 64, 1664, jnp.bfloat16, batch=32)
    mm_case("qk K=128 [1664,128]x[128,1664] -> f32", 1664, 128, 1664, jnp.float32)
    mm_case("qk K=256 [1664,256]x[256,1664] -> f32", 1664, 256, 1664, jnp.float32)
    mm_case("qk K=512 [1664,512]x[512,1664] -> f32", 1664, 512, 1664, jnp.float32)

    # attention-shaped: N=64 output
    mm_case("pv N=64 [1664,1664]x[1664,64] -> f32", 1664, 1664, 64, jnp.float32)
    mm_case("pv N=64 batched x32 -> f32", 1664, 1664, 64, jnp.float32, batch=32)
    mm_case("pv N=128 [1664,1664]x[1664,128] -> f32", 1664, 1664, 128, jnp.float32)


if __name__ == "__main__":
    main()
