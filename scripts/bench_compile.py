"""Decompose the cold-compile cost of the bench/serve synthesis path.

Separately times trace+lower vs XLA-compile for: the fused sampler+vocoder
jit (bench.py's 255 s offender), the sampler alone, the vocoder alone, one
CFG forward, and the flash kernel alone. Run twice to see what the
persistent compilation cache absorbs.

    python scripts/bench_compile.py [--no-cache]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--no-flash", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from oron_tts_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.models.vocos import VocosDecoder

    print(f"# backend={jax.default_backend()} cache={not args.no_cache}",
          file=sys.stderr)

    t_total = 120 * 13
    T = -(-t_total // 64) * 64
    model = DiT(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4, dropout=0.0,
        mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=not args.no_flash,
    )
    cfm = CFM(model, CFMConfig())
    vocoder = VocosDecoder(dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, T, 100), jnp.float32)
    text = jax.random.randint(k1, (1, T), 0, 65, dtype=jnp.int32)
    variables = model.init(k2, x, x, text, jnp.zeros((1,)))
    voc_vars = vocoder.init(k2, jnp.zeros((1, 100, t_total), jnp.float32))
    cond = jnp.zeros((1, T, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    lens = jnp.asarray([0], jnp.int32)
    noise = jax.random.normal(k3, (1, T, 100), jnp.float32)

    def stage_times(name: str, fn, *fargs):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*fargs)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        print(f"{name:36s} trace+lower {t_lower:6.1f}s   "
              f"xla-compile {t_compile:6.1f}s")

    def sample_full(variables, voc_vars, cond, text, duration, lens, noise):
        mel, _ = cfm.sample(
            variables, cond, text, duration, lens, steps=32,
            cfg_strength=2.0, sway_sampling_coef=-1.0, noise=noise,
        )
        mel = jnp.swapaxes(mel[:, :t_total], 1, 2)
        return vocoder.apply(voc_vars, mel)

    def sample_only(variables, cond, text, duration, lens, noise):
        mel, _ = cfm.sample(
            variables, cond, text, duration, lens, steps=32,
            cfg_strength=2.0, sway_sampling_coef=-1.0, noise=noise,
        )
        return mel

    def vocode(voc_vars, mel):
        return vocoder.apply(voc_vars, mel)

    te = model.apply(variables, text, T, False, method="embed_text")

    def one_fwd(variables, xx):
        return model.apply(
            variables, xx, cond, te, te, jnp.zeros((1,)), None,
            method="forward_cfg",
        )

    stage_times("one forward_cfg", one_fwd, variables, noise)
    stage_times("vocoder alone", vocode, voc_vars,
                jnp.zeros((1, 100, t_total), jnp.float32))
    stage_times("sampler alone (32-step scan)", sample_only,
                variables, cond, text, duration, lens, noise)
    stage_times("sampler+vocoder fused (bench fn)", sample_full,
                variables, voc_vars, cond, text, duration, lens, noise)


if __name__ == "__main__":
    main()
