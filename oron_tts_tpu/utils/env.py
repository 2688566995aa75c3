"""Tiny .env loader (python-dotenv is not in the image) + platform pinning."""

from __future__ import annotations

import os
from pathlib import Path


def pin_platform(want: str) -> None:
    """Pin JAX onto ``want`` — the ONLY reliable recipe on images that
    pre-register a remote-TPU (axon) plugin.

    ``jax.config.update("jax_platforms", ...)`` alone is NOT enough there:
    the plugin still initializes at first backend use and, when the tunnel
    is down, hangs forever dialing it. The env var must be set and the
    plugin's pool var dropped BEFORE the first backend use (importing jax
    is fine; initializing a backend is not).
    """
    os.environ["JAX_PLATFORMS"] = want
    if want != "axon":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass


def load_dotenv(path: str | Path = ".env") -> bool:
    p = Path(path)
    if not p.exists():
        return False
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key, value = key.strip(), value.strip().strip("'\"")
        os.environ.setdefault(key, value)
    return True


def resolve_hf_token(token: str | None = None) -> str | None:
    return (
        token
        or os.getenv("HF_TOKEN")
        or os.getenv("HUGGING_FACE_HUB_TOKEN")
        or os.getenv("HUGGINGFACE_HUB_TOKEN")
    )
