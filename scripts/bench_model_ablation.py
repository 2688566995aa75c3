"""Model-level cost decomposition: per-block, attention share, impl choice.

Times an 8-iteration in-jit scan of forward_cfg (the sampler's unit of
work) across DiT variants: depth {22, 11}, attn_impl {flash, einsum,
packed, skip}. Depth pairs give the per-block cost and fixed overhead;
the skip ablation gives attention's absolute share. All at the production
synthesis shape (Base, T=1600 bucket, CFG batch 2, bf16).

    python scripts/bench_model_ablation.py
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

    from oron_tts_tpu.models.dit import DiT

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    t_total = 120 * 13
    T = -(-t_total // 64) * 64
    ITERS = 8

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, T, 100), jnp.float32)
    text = jax.random.randint(k1, (1, T), 0, 65, dtype=jnp.int32)
    noise = jax.random.normal(k3, (1, T, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    attn_mask = jnp.arange(T)[None, :] < duration[:, None]
    cond = jnp.zeros((1, T, 100), jnp.float32)

    results = {}

    import os

    conv_impl = os.environ.get("ORON_ABLATE_CONV", "xla")

    def measure(depth: int, impl: str) -> float:
        model = DiT(
            dim=1024, depth=depth, heads=16, dim_head=64, ff_mult=4,
            dropout=0.0, mel_dim=100, vocab_size=65, text_dim=512,
            conv_layers=4, dtype=jnp.bfloat16, attn_impl=impl,
            conv_impl=conv_impl,
        )
        variables = model.init(k2, x, x, text, jnp.zeros((1,)))
        te = model.apply(variables, text, T, False, method="embed_text")

        @jax.jit
        def run(variables, x0):
            def body(xx, i):
                pred, null = model.apply(
                    variables, xx, cond, te, te,
                    jnp.full((1,), 0.5, jnp.float32), attn_mask,
                    method="forward_cfg",
                )
                out = pred + (pred - null) * 2.0
                return xx + 0.03 * out, ()

            xf, _ = jax.lax.scan(body, x0, jnp.arange(ITERS))
            return jnp.sum(xf.astype(jnp.float32))

        t0 = time.perf_counter()
        float(run(variables, noise))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(variables, noise))
            best = min(best, time.perf_counter() - t0)
        dt = best / ITERS
        print(f"depth={depth:2d} attn={impl:7s} {dt*1e3:8.2f} ms/fwd "
              f"(compile {compile_s:.0f}s)")
        results[(depth, impl)] = dt
        return dt

    for impl in ("flash", "einsum", "packed", "skip"):
        measure(22, impl)
    for impl in ("flash", "skip"):
        measure(11, impl)

    f22, f11 = results[(22, "flash")], results[(11, "flash")]
    s22, s11 = results[(22, "skip")], results[(11, "skip")]
    per_block = (f22 - f11) / 11
    fixed = f22 - 22 * per_block
    attn_per_block = (f22 - s22) / 22
    print("# --- derived ---", file=sys.stderr)
    print(f"# per-block (flash): {per_block*1e3:.3f} ms; fixed: "
          f"{fixed*1e3:.2f} ms/fwd", file=sys.stderr)
    print(f"# attention per block: flash {attn_per_block*1e3:.3f} ms, "
          f"einsum {(results[(22,'einsum')]-s22)/22*1e3:.3f} ms, "
          f"packed {(results[(22,'packed')]-s22)/22*1e3:.3f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
