"""Measure streaming time-to-first-audio (TTFA) on the real chip.

Protocol: Base config (dim 1024, depth 22), bf16, scan_blocks, a long
~600-char Mongolian text that splits into ~5 chunks of ≤120 chars, 32
Euler steps with CFG — the bench.py serving protocol, but through
``F5TTS.synthesize_stream``. Reported:

  ttfa        wall time until the FIRST waveform piece is on the host
              (one single-chunk B=1 solve + one vocoder call; later
              chunk groups are already enqueued behind it)
  total       wall time until the LAST piece (≈ synthesize() latency)
  audio_s     total audio seconds produced

The interesting ratio is ttfa/total: a playback client starts hearing
audio after ~1/len(chunks) of the full solve instead of waiting for all
of it. Timing only (random weights); piece-vs-batch numerics are pinned
by tests/test_serve.py and the determinism contract in models/f5tts.py.

    python scripts/bench_streaming.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def build_model(jax, jnp):
    from bench import force_sync, random_params_like
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.models.vocos import VocosDecoder

    cfg = {
        "sample_rate": 24000, "n_mels": 100, "n_fft": 1024,
        "hop_length": 256,
        "model": {
            "dim": 1024, "depth": 22, "heads": 16, "dim_head": 64,
            "ff_mult": 4, "text_dim": 512, "conv_layers": 4,
            "vocab_size": 65, "p_dropout": 0.0, "scan_blocks": True,
        },
    }
    model = F5TTS(F5Config.from_dict(cfg), dtype=jnp.bfloat16)
    model.variables = random_params_like(
        jax.eval_shape(
            model.backbone.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 100)), jnp.zeros((1, 64, 100)),
            jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,)),
        ), seed=2,
    )
    vocoder = VocosDecoder(dtype=jnp.bfloat16)
    voc_vars = random_params_like(
        jax.eval_shape(vocoder.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 100, 64), jnp.float32)),
    )
    model.set_vocoder(vocoder, voc_vars)
    force_sync(model.variables, voc_vars)
    return model


def main() -> None:
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    model = build_model(jax, jnp)

    words = ("сайн байна уу та нар өнөөдөр хэрхэн байна вэ монгол улс "
             "сайхан орон юм шүү өргөн уудам тал нутаг").split()
    text = ""
    i = 0
    while len(text) < 600:
        text += words[i % len(words)] + " "
        i += 1
    text = text.strip()
    from oron_tts_tpu.models.f5tts import split_text_for_synthesis

    n_chunks = len(split_text_for_synthesis(text, 120))

    def run():
        t0 = time.perf_counter()
        ttfa = None
        pieces = []
        for piece in model.synthesize_stream(text, n_steps=32, seed=0):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            pieces.append(np.asarray(piece))
        total = time.perf_counter() - t0
        wav = np.concatenate(pieces)
        assert np.isfinite(wav).all()
        return ttfa, total, len(pieces), wav.shape[0] / model.sample_rate

    t0 = time.perf_counter()
    run()  # compile (first-chunk bucket + remaining group buckets)
    print(f"# warmup (compiles incl.): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = min((run() for _ in range(3)), key=lambda r: r[1])
    ttfa, total, n_pieces, audio_s = best
    print(
        f"text: {len(text)} chars"
        + (f", {n_chunks} chunks" if n_chunks else "")
        + f", {n_pieces} pieces, {audio_s:.1f} audio-s\n"
        f"TTFA {ttfa:.3f}s  total {total:.3f}s  "
        f"ttfa/total {ttfa / total:.2f}  "
        f"RTF(total) {total / audio_s:.4f}"
    )


if __name__ == "__main__":
    main()
