"""Measure the pipelined gradient-accumulation path (VERDICT r2 #6).

Compares, at Base config with grad_accumulation_steps=4 (4 microbatches
of B=3, T=2048 — the runpod-recipe shape on one chip):
- NEW: on-device accumulator, no host reads inside the window
  (train/trainer.py make_accum_step/make_apply_accum_step)
- OLD (emulated): a host sync after every microbatch, which is what
  `float(loss)` per microbatch cost in round 2

    python scripts/bench_grad_accum.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import random_params_like
    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.train.trainer import (
        TrainState,
        make_accum_step,
        make_apply_accum_step,
        make_lr_schedule,
        make_optimizer,
        make_zero_accum,
    )

    B_micro, T, K = 3, 2048, 4
    model = DiT(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4, dropout=0.1,
        mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=True, gradient_checkpointing=False,
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
    params = variables["params"]
    tx = make_optimizer(make_lr_schedule(1e-4, 1000, 100000),
                        mu_dtype=jnp.bfloat16)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.asarray(0, jnp.int32), ema_updates=jnp.asarray(0, jnp.int32),
    )
    batch = {
        "mel": jax.random.normal(k2, (B_micro, 100, T), jnp.float32) * 0.5,
        "text_ids": jax.random.randint(k3, (B_micro, T), 0, 65, jnp.int32),
        "mel_lengths": jnp.full((B_micro,), T, jnp.int32),
    }

    accum = make_accum_step(cfm)
    apply = make_apply_accum_step(tx, 0.9999)
    zero = make_zero_accum()

    def window(state, rng, sync_each_micro: bool):
        acc = zero(state.params)
        for i in range(K):
            acc = accum(acc, state.params, batch, jax.random.fold_in(rng, i))
            if sync_each_micro:
                float(np.asarray(acc["loss_sum"]))  # the r2-style host sync
        state, metrics = apply(state, acc)
        return state, metrics

    # warmup (compile both modes' graphs; same executables)
    state, metrics = window(state, jax.random.fold_in(k1, 999), False)
    float(np.asarray(metrics["loss"]))
    state, metrics = window(state, jax.random.fold_in(k1, 998), False)
    float(np.asarray(metrics["loss"]))

    results = {}
    for name, sync in (("pipelined", False), ("per-micro host sync", True)):
        iters = 6
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = window(state, jax.random.fold_in(k1, i), sync)
        loss = float(np.asarray(metrics["loss"]))  # drain
        dt = (time.perf_counter() - t0) / iters
        frames = B_micro * K * T
        print(f"{name}: {dt*1e3:.0f} ms/window ({K}x B={B_micro} micro) "
              f"-> {frames/dt:,.0f} frames/s (loss {loss:.3f})", flush=True)
        results[name] = dt
    delta = results["per-micro host sync"] / results["pipelined"] - 1
    print(f"per-microbatch host sync costs +{delta*100:.1f}% window time")


if __name__ == "__main__":
    main()
