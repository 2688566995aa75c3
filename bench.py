"""Benchmark: Base-config 32-NFE synthesis real-time factor on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): RTF < 0.05 per v5e chip for Base DiT
(dim=1024, depth=22), 32 Euler steps with CFG (64 DiT forwards), 24 kHz
output. vs_baseline = 0.05 / measured_rtf (>1 = beating the target).

The measured pipeline is the production path: stretched text ids → CFG
Euler sampler (bf16 DiT, jitted, text embeddings hoisted) → Vocos decode →
host transfer. Mel frames correspond to a full 120-char chunk
(~1560 frames ≈ 16.6 s of audio).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

TARGET_RTF = 0.05


def main() -> None:
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.models.vocos import VocosDecoder

    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()}", file=sys.stderr)

    import os

    use_flash = os.environ.get("ORON_BENCH_FLASH", "1") != "0"
    # Base config, bf16 compute
    model = DiT(
        dim=1024, depth=22, heads=16, dim_head=64, ff_mult=4,
        dropout=0.0, mel_dim=100, vocab_size=65, text_dim=512, conv_layers=4,
        dtype=jnp.bfloat16, use_flash=use_flash,
    )
    print(f"# use_flash={use_flash}", file=sys.stderr)
    cfm = CFM(model, CFMConfig())
    vocoder = VocosDecoder(dtype=jnp.bfloat16)

    # 120-char chunk → chars*13 ≈ 1560 frames, bucketed to 1664
    n_steps, cfg_strength, sway = 32, 2.0, -1.0
    t_total = 120 * 13
    bucket = -(-t_total // 64) * 64
    audio_seconds = t_total * 256 / 24000

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    T = bucket
    x = jnp.zeros((1, T, 100), jnp.float32)
    text = jax.random.randint(k1, (1, T), 0, 65, dtype=jnp.int32)
    variables = model.init(k2, x, x, text, jnp.zeros((1,)))
    # zero-init proj_out makes the ODE trivial; randomize for a honest run
    variables = jax.tree_util.tree_map(
        lambda a: jax.random.normal(k3, a.shape, a.dtype) * 0.02
        if a.ndim >= 2 else a,
        variables,
    )
    voc_vars = vocoder.init(k2, jnp.zeros((1, 100, T), jnp.float32))

    cond = jnp.zeros((1, bucket, 100), jnp.float32)
    duration = jnp.asarray([t_total], jnp.int32)
    lens = jnp.asarray([0], jnp.int32)
    noise = jax.random.normal(k3, (1, bucket, 100), jnp.float32)

    @jax.jit
    def synthesize(variables, voc_vars, cond, text, duration, lens, noise):
        mel, _ = cfm.sample(
            variables, cond, text, duration, lens,
            steps=n_steps, cfg_strength=cfg_strength, sway_sampling_coef=sway,
            noise=noise,
        )
        mel = jnp.swapaxes(mel[:, :t_total], 1, 2)
        wav = vocoder.apply(voc_vars, mel)
        # scalar checksum: fetching it forces full execution even on backends
        # whose block_until_ready is a no-op (the axon tunnel)
        return wav, jnp.mean(jnp.abs(wav))

    args = (variables, voc_vars, cond, text, duration, lens, noise)

    def timed_run():
        t0 = time.perf_counter()
        wav, checksum = synthesize(*args)
        float(checksum)  # device→host sync
        return time.perf_counter() - t0, wav

    compile_s, wav = timed_run()
    print(f"# compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        dt, wav = timed_run()
        times.append(dt)
    best = min(times)
    rtf = best / audio_seconds
    print(
        f"# wall={best:.3f}s audio={audio_seconds:.2f}s "
        f"runs={[round(t, 3) for t in times]}", file=sys.stderr,
    )
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"

    print(json.dumps({
        "metric": "synthesis_rtf_base_32nfe",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
