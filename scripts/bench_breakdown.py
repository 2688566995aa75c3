"""Decompose Base-config synthesis wall time on the real chip.

Times: full 32-NFE sampler, one CFG DiT forward, attention-only cost
(flash on vs einsum at jit level), vocoder decode, text-embed hoisting.
Guides which component is worth kernel effort (VERDICT r1 #2/#8).

    python scripts/bench_breakdown.py
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

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.models.vocos import VocosDecoder

    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    t_total = 120 * 13
    T = -(-t_total // 64) * 64  # 1600 → bucket 1664
    n_steps, cfg_strength, sway = 32, 2.0, -1.0

    def build(use_flash: bool):
        model = DiT(
            dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4,
            dropout=0.0, mel_dim=100, vocab_size=65, text_dim=512,
            conv_layers=4, dtype=jnp.bfloat16, use_flash=use_flash,
        )
        return model, CFM(model, CFMConfig())

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, T, 100), jnp.float32)
    text = jax.random.randint(k1, (1, T), 0, 65, dtype=jnp.int32)
    model_f, cfm_f = build(True)
    variables = model_f.init(k2, x, x, text, jnp.zeros((1,)))
    variables = jax.tree_util.tree_map(
        lambda a: jax.random.normal(k3, a.shape, a.dtype) * 0.02
        if a.ndim >= 2 else a,
        variables,
    )
    model_e, cfm_e = build(False)

    cond = jnp.zeros((1, T, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    lens = jnp.asarray([0], jnp.int32)
    noise = jax.random.normal(k3, (1, T, 100), jnp.float32)
    attn_mask = jnp.arange(T)[None, :] < duration[:, None]

    def timed(name: str, fn, *fargs, iters: int = 5) -> float:
        t0 = time.perf_counter()
        out = fn(*fargs)
        float(jnp.sum(out if not isinstance(out, tuple) else out[0]
                      ).astype(jnp.float32))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        tail = out if not isinstance(out, tuple) else out[0]
        float(jnp.sum(tail).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt*1e3:9.2f} ms   (compile {compile_s:.1f}s)")
        return dt

    # one CFG forward (the unit the sampler repeats 32x)
    te_c = model_f.apply(variables, text, T, False, method="embed_text")
    te_u = model_f.apply(variables, text, T, True, method="embed_text")

    def one_fwd(cfm_model):
        def f(variables, xx):
            pred, null = cfm_model.backbone.apply(
                variables, xx, cond, te_c, te_u,
                jnp.full((1,), 0.5, jnp.float32), attn_mask,
                method="forward_cfg",
            )
            return pred + (pred - null) * cfg_strength

        return jax.jit(f)

    x0 = jnp.asarray(noise)
    t_fwd_flash = timed("DiT forward_cfg (flash)", one_fwd(cfm_f), variables, x0)
    t_fwd_einsum = timed("DiT forward_cfg (einsum)", one_fwd(cfm_e), variables, x0)

    # full sampler
    def sampler(cfm_model):
        def f(variables, noise):
            mel, _ = cfm_model.sample(
                variables, cond, text, duration, lens, steps=n_steps,
                cfg_strength=cfg_strength, sway_sampling_coef=sway,
                noise=noise,
            )
            return mel

        return jax.jit(f)

    t_sample = timed("32-NFE sampler (flash)", sampler(cfm_f), variables,
                     noise, iters=3)
    print(f"# sampler/forward ratio: {t_sample / t_fwd_flash:.1f} "
          f"(expect ~32 + overhead)", file=sys.stderr)

    # vocoder
    vocoder = VocosDecoder(dtype=jnp.bfloat16)
    voc_vars = vocoder.init(k2, jnp.zeros((1, 100, t_total), jnp.float32))
    mel_in = jax.random.normal(k1, (1, 100, t_total), jnp.float32)
    voc_fn = jax.jit(lambda v, m: vocoder.apply(v, m))
    t_voc = timed("vocoder decode", voc_fn, voc_vars, mel_in)

    # text embed (hoisted out of the loop — one-time cost)
    te_fn = jax.jit(
        lambda v: model_f.apply(v, text, T, False, method="embed_text")
    )
    t_te = timed("text embed (one branch)", te_fn, variables)

    print("# --- summary ---", file=sys.stderr)
    print(f"# fwd(flash) {t_fwd_flash*1e3:.2f} ms  fwd(einsum) "
          f"{t_fwd_einsum*1e3:.2f} ms  -> attention delta "
          f"{(t_fwd_einsum - t_fwd_flash)*1e3:.2f} ms/fwd", file=sys.stderr)
    est = 32 * t_fwd_flash + t_voc + 2 * t_te
    print(f"# 32*fwd + voc + 2*te = {est:.3f}s vs sampler+voc "
          f"{t_sample + t_voc:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
