"""Measure the int8 serving levers on the real chip.

Two tiers, both against the bf16 baseline the serving path uses by
default (cli/infer.py stores params bf16 on TPU):

1. Kernel tier: the Base DiT projection shapes (dim=1024, ff 4096) at a
   serving M (rows = 2·B·T for the CFG-doubled solve), timed in-jit via
   lax.scan min-of-repeats — bf16 ``x @ w`` vs w8a16
   (ops/quantized_matmul.quantized_matmul, Pallas dequant-in-kernel) vs
   w8a8 (w8a8_matmul, native s8×s8→s32 MXU dot). Expected: w8a16 wins
   when the matmul is bandwidth-bound (small M), w8a8 wins at compute
   bound (int8 MXU peak 394 vs 197 bf16 TOPS on v5e).
2. End-to-end tier (``--e2e``): Base-config 32-step CFG synthesis RTF
   with quantize_for_serving(mode) vs full bf16, same protocol as
   bench.py (random weights — timing only, numerics are pinned by
   tests/test_quantized.py).

    python scripts/bench_quantized.py           # kernel tier
    python scripts/bench_quantized.py --e2e     # + end-to-end RTF
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def _timed_scan(jax, jnp, fn, args, iters: int = 20, reps: int = 5) -> float:
    """min-of-reps seconds per call, measured as an in-jit scan (keeps
    the axon per-dispatch overhead out of the per-iteration number)."""

    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            # fold the output back in so the scan can't be DCE'd
            return c + out.astype(jnp.float32).ravel()[0], None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return total

    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def kernel_tier(jax, jnp) -> None:
    from oron_tts_tpu.ops.quantized_matmul import (
        quantize_weight,
        quantized_matmul,
        w8a8_matmul,
    )

    key = jax.random.PRNGKey(0)
    DIM = 1024
    # (name, K, N) — the quantized Base projections (dit.quantize_dit_params)
    layers = [
        ("to_qkv (1024->1024)", DIM, DIM),
        ("ff in_proj (1024->4096)", DIM, 4 * DIM),
        ("ff out_proj (4096->1024)", 4 * DIM, DIM),
    ]
    # serving row counts: 2·B·T of the CFG solve. 2·1·256 = short chunk,
    # 2·1·1600 = 17 s single utterance, 2·8·1024 = a serving group
    for m in (512, 3200, 16384):
        print(f"\n## M={m} rows")
        for name, k, n in layers:
            w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
            x = jax.random.normal(key, (m, k), jnp.bfloat16)
            q, s = quantize_weight(w)
            wb = w.astype(jnp.bfloat16)
            flops = 2 * m * k * n

            t_bf16 = _timed_scan(
                jax, jnp,
                lambda a, b: jax.lax.dot(
                    a, b, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16),
                (x, wb),
            )
            interp = jax.default_backend() != "tpu"  # CPU smoke only
            t_w8a16 = _timed_scan(
                jax, jnp,
                lambda a, b, c: quantized_matmul(a, b, c, interpret=interp),
                (x, q, s),
            )
            t_w8a8 = _timed_scan(jax, jnp, w8a8_matmul, (x, q, s))
            print(
                f"{name:28s} bf16 {t_bf16*1e6:8.1f} us"
                f" ({flops/t_bf16/1e12:5.1f} TF/s) |"
                f" w8a16 {t_w8a16*1e6:8.1f} us ({t_bf16/t_w8a16:4.2f}x) |"
                f" w8a8 {t_w8a8*1e6:8.1f} us ({t_bf16/t_w8a8:4.2f}x)"
            )


def e2e_tier(jax, jnp) -> None:
    import numpy as np

    from bench import random_params_like
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"model": {"vocab_size": 65, "dim": 1024, "depth": 22,
                     "heads": 16, "dim_head": 64, "ff_mult": 4,
                     "text_dim": 512, "conv_layers": 4, "p_dropout": 0.0,
                     "scan_blocks": True}}
    text = "Сайн байна уу, энэ бол интонацийг шалгах урт өгүүлбэр юм."

    for mode in (None, "int8", "int8_dynamic"):
        model = F5TTS(F5Config.from_dict(cfg), dtype=jnp.bfloat16)
        model.variables = random_params_like(
            jax.eval_shape(
                model.backbone.init, jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
                jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
            ), seed=2,
        )
        if mode:
            model.quantize_for_serving(mode)
        from oron_tts_tpu.models.vocos import VocosDecoder

        vocoder = VocosDecoder(dtype=jnp.bfloat16)
        model.set_vocoder(vocoder, random_params_like(
            jax.eval_shape(vocoder.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, 100, 64), jnp.float32)),
        ))
        t0 = time.perf_counter()
        wav = model.synthesize(text, n_steps=32, seed=0)
        cold = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            wav = model.synthesize(text, n_steps=32, seed=0)
            times.append(time.perf_counter() - t0)
        wall = min(times)
        audio_s = wav.size / 24000
        label = mode or "bf16"
        print(f"{label:14s} compile+first {cold:6.1f}s  wall {wall:.3f}s  "
              f"audio {audio_s:.2f}s  RTF {wall/audio_s:.4f}")
        assert np.isfinite(np.asarray(wav)).all()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--e2e", action="store_true")
    parser.add_argument("--device", type=str, default=None)
    args = parser.parse_args()

    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    import jax.numpy as jnp

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    kernel_tier(jax, jnp)
    if args.e2e:
        print("\n## end-to-end Base 32-step synthesis")
        e2e_tier(jax, jnp)


if __name__ == "__main__":
    main()
