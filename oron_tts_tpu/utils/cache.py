"""Persistent XLA compilation cache setup.

Base-config compiles take ~10 minutes through the TPU tunnel; the persistent
cache turns reruns of bench/infer/train into warm starts. Safe to call
multiple times; controlled by ORON_COMPILE_CACHE (set to "0" to disable).
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    if os.environ.get("ORON_COMPILE_CACHE") == "0":
        return
    import jax

    path = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "oron_tts_tpu" / "xla"
    )
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        # keep the 5 s write threshold: lowering it to cache the dozens of
        # tiny per-leaf relayout identities looks attractive (~15 s of a
        # Base train cold start) but is UNSAFE — the cache key for
        # _identity_fn does not distinguish the requested output layout,
        # so a cached identity compiled for one layout gets replayed for
        # another and the AOT train step then rejects its own state
        # (measured: "Computation was compiled for input layouts that
        # disagree..." on mu dwconv kernels and batch mel)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without these flags
