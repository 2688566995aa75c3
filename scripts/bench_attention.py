"""Sweep flash-attention variants on the real chip (VERDICT r1 #2).

Times each variant at the production workloads (synthesis: B=2 CFG double
batch, H=16, T=1664, D=64, prefix kv_len 1560; training: B=8). The axon
backend executes lazily, so timing fetches a scalar checksum after a run
batch to force completion.

    python scripts/bench_attention.py [--t 1664] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1664)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--backward", action="store_true")
    args = ap.parse_args()

    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_packed,
        flash_attention_trainable,
    )

    B, H, T, D = args.b, args.h, args.t, args.d
    print(f"# backend={jax.default_backend()} B={B} H={H} T={T} D={D}",
          file=sys.stderr)
    kv_len = int(T * 0.94) // 8 * 8

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, T, D), jnp.bfloat16)
    kv_lens = jnp.full((B,), kv_len, jnp.int32)
    mask = (jnp.arange(T)[None, :] < kv_lens[:, None])

    def einsum_attn(q, k, v):
        import math

        scale = 1.0 / math.sqrt(D)
        logits = jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", probs, v)

    # The axon tunnel adds ~1-2 ms dispatch overhead PER jit call, which
    # swamps a single attention op. Amortize: scan the op args.iters times
    # inside ONE jit, chaining the output into the next query so XLA cannot
    # dead-code or parallelize the iterations.
    def timed(name: str, op) -> float:
        @jax.jit
        def run(q, k, v):
            def body(x, _):
                o = op(x, k, v)
                return (o + q).astype(q.dtype), ()

            x, _ = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.sum(x.astype(jnp.float32))

        float(run(q, k, v))  # compile + warm
        t0 = time.perf_counter()
        float(run(q, k, v))
        total = time.perf_counter() - t0
        dt = total / args.iters
        flops = 4 * T * T * D * B * H
        print(f"{name:48s} {dt*1e3:8.3f} ms   {flops/dt/1e12:6.1f} TFLOP/s eff")
        return dt

    results: dict[str, float] = {}

    # chip peak sanity: one large square matmul (shapes the MXU loves)
    M = 4096

    @jax.jit
    def big_matmul(a, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16), ()

        x, _ = jax.lax.scan(body, a, None, length=args.iters)
        return jnp.sum(x.astype(jnp.float32))

    a = jax.random.normal(kq, (M, M), jnp.bfloat16)
    bmat = jax.random.normal(kk, (M, M), jnp.bfloat16) * (1.0 / M)
    float(big_matmul(a, bmat))
    t0 = time.perf_counter()
    float(big_matmul(a, bmat))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{'peak sanity: 4096^3 bf16 matmul':48s} {dt*1e3:8.3f} ms   "
          f"{2*M**3/dt/1e12:6.1f} TFLOP/s")

    # XLA attention-shaped matmuls (HBM-bound: materializes the [T,T] f32
    # score tensor — NOT a compute ceiling, listed for context)
    def matmul_only(q, k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("bhts,bhsd->bhtd", s.astype(q.dtype), v)

    results["matmul_hbm"] = timed("xla matmul-only (HBM-bound)", matmul_only)

    # kernel-internal split: same pallas structure but softmax replaced by a
    # cheap scale — isolates MXU time from VPU softmax time
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _nosm_kernel(q_ref, k_ref, v_ref, o_ref):
        q_ = q_ref[0]
        s = jax.lax.dot_general(
            q_, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = jax.lax.dot(
            (s * (1.0 / T)).astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = acc.astype(o_ref.dtype)

    def flash_nosm(q, k, v, block_q=832):
        bh = B * H
        qf = q.reshape(bh, T, D)
        grid = (bh, T // block_q)
        out = pl.pallas_call(
            _nosm_kernel,
            out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        )(qf, k.reshape(bh, T, D), v.reshape(bh, T, D))
        return out.reshape(B, H, T, D)

    results["pallas_nosm"] = timed("pallas matmuls-only (no softmax)",
                                   flash_nosm)
    results["xla_einsum"] = timed("xla_einsum", einsum_attn)

    def flash(name, **kw):
        fn = functools.partial(flash_attention, kv_lens=kv_lens, **kw)
        results[name] = timed(name, fn)

    flash("flash exp  (r1 default)", use_exp2=False)
    flash("flash exp2", use_exp2=True)

    for bq in (104, 208, 416, 832):
        if T % bq == 0:
            results[f"packed bq={bq}"] = timed(
                f"flash packed 2-head bq={bq}",
                functools.partial(flash_attention_packed, kv_lens=kv_lens,
                                  block_q=bq),
            )
    results["packed auto"] = timed(
        "flash packed 2-head (auto bq)",
        functools.partial(flash_attention_packed, kv_lens=kv_lens),
    )

    # stock pallas kernel, if this jax ships one that fits
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as stock_flash,
        )

        def stock(q, k, v):
            return stock_flash(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), causal=False,
            ).astype(q.dtype)

        results["stock_pallas_f32"] = timed("stock_pallas_f32", stock)
    except Exception as exc:  # pragma: no cover
        print(f"# stock pallas kernel unavailable: {exc}", file=sys.stderr)

    if args.backward:
        def flash_fwd_bwd(x, k, v):
            def loss(x, k, v):
                o = flash_attention_trainable(x, k, v, kv_lens, False)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1, 2))(x, k, v)
            return g[0] + g[1] + g[2]

        results["flash_fwd_bwd"] = timed("flash fwd+bwd (grads)", flash_fwd_bwd)

        def einsum_fwd_bwd(x, k, v):
            def loss(x, k, v):
                return jnp.sum(einsum_attn(x, k, v).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1, 2))(x, k, v)
            return g[0] + g[1] + g[2]

        results["einsum_fwd_bwd"] = timed("einsum fwd+bwd (grads)",
                                          einsum_fwd_bwd)

    best = min(results, key=results.get)
    print(f"# best: {best} ({results[best]*1e3:.3f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
