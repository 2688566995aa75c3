"""Measure the round-3 sampler levers' RTF effect on the real chip.

Base config (dim 1024, depth 22, heads 16), 120-char chunk (T bucket
1664), bf16, scan_blocks, lanes attention — the exact bench.py synthesis
protocol — across the opt-in solver levers:

  baseline          32-step Euler, CFG every step, t-mods hoisted
  no-hoist          same, hoist_t_mods=False (the reference's shape:
                    AdaLN matmuls re-run at M=2 rows inside every step)
  cfg-interval      32-step Euler, CFG only for t in [0.10, 0.70]
                    (arXiv:2404.07724's recommended band shape)
  midpoint-16       16 midpoint steps = 32 NFE (error ~1/S^2 vs 1/S)
  midpoint+interval both levers together
  int8 w8a16        int8 DiT projection weights, Pallas dequant-in-kernel
  int8_dynamic w8a8 + per-token activation quant, s8xs8 int8-MXU dot
  int8_dyn+interval the compute lever and the NFE lever together

Timing only (random weights); numerics of every lever are pinned by
tests/test_t_mods_hoist.py, test_cfg_interval.py, test_ode_method.py.

    python scripts/bench_sampler_levers.py
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
    import numpy as np

    from bench import force_sync, random_params_like
    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT, quantize_dit_params

    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    base_kw = dict(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4, dropout=0.0,
        mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=True, scan_blocks=True,
        conv_impl="pallas",
    )
    model = DiT(**base_kw)
    cfm = CFM(model, CFMConfig())

    t_total = 120 * 13
    bucket = -(-t_total // 64) * 64
    audio_s = t_total * 256 / 24000

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    text = jax.random.randint(k1, (1, bucket), 0, 65, dtype=jnp.int32)
    variables = random_params_like(
        jax.eval_shape(
            model.init, k2, jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
            jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
        ),
    )
    cond = jnp.zeros((1, bucket, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    lens = jnp.asarray([0], jnp.int32)
    noise = jax.random.normal(k3, (1, bucket, 100), jnp.float32)
    force_sync(variables, noise, text)

    # int8 serving variants: quantized params + a quant-mode DiT (the
    # same in-memory transform F5TTS.quantize_for_serving applies)
    qvars = {"params": jax.jit(quantize_dit_params)(variables["params"])}
    force_sync(qvars)
    cfm_w8a16 = CFM(DiT(**base_kw, quant="int8"), CFMConfig())
    cfm_w8a8 = CFM(DiT(**base_kw, quant="int8_dynamic"), CFMConfig())

    cases = [
        ("baseline (euler32, hoist, full CFG)", cfm, variables,
         dict(steps=32)),
        ("no-hoist", cfm, variables, dict(steps=32, hoist_t_mods=False)),
        ("cfg-interval [0.10,0.70]", cfm, variables,
         dict(steps=32, cfg_interval=(0.10, 0.70))),
        ("midpoint-16 (32 NFE)", cfm, variables,
         dict(steps=16, method="midpoint")),
        ("midpoint-16 + interval", cfm, variables,
         dict(steps=16, method="midpoint", cfg_interval=(0.10, 0.70))),
        ("int8 w8a16", cfm_w8a16, qvars, dict(steps=32)),
        ("int8_dynamic w8a8", cfm_w8a8, qvars, dict(steps=32)),
        ("int8_dynamic + interval", cfm_w8a8, qvars,
         dict(steps=32, cfg_interval=(0.10, 0.70))),
    ]

    for label, case_cfm, case_vars, kw in cases:
        def run(variables, cond, text, duration, lens, noise,
                _kw=kw, _cfm=case_cfm):
            mel, _ = _cfm.sample(
                variables, cond, text, duration, lens,
                cfg_strength=2.0, sway_sampling_coef=-1.0, noise=noise, **_kw,
            )
            return jnp.mean(jnp.abs(mel))

        fn = jax.jit(run)
        args = (case_vars, cond, text, duration, lens, noise)
        t0 = time.perf_counter()
        out = float(fn(*args))
        cold = time.perf_counter() - t0
        assert np.isfinite(out), f"non-finite mel mean in {label}"
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{label:38s} compile {cold:6.1f}s  solve {best:.3f}s  "
            f"RTF(solve) {best / audio_s:.4f}"
        )
        fn.clear_cache()


if __name__ == "__main__":
    main()
