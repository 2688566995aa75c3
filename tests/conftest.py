"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Must set env vars before jax initializes its backends, hence module scope.
The TPU tunnel is intentionally avoided in unit tests; the bench script and
driver exercise the real chip.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment image pins JAX_PLATFORMS=axon (TPU tunnel) at a level the
# env var alone doesn't always override; pin the config explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


def add_reference_to_path() -> None:
    """Allow `import src.*` from the read-only reference for parity tests.

    The reference package __init__ files eagerly import soundfile/torchaudio
    (absent here), so we register namespace-style stand-ins for `src`,
    `src.utils`, `src.models`, `src.data` whose __path__ points into the
    reference tree without executing their __init__ side effects. Leaf
    modules (number_norm, tokenizer, dit, flow, ...) then import normally.
    """
    import types

    ref = str(REFERENCE_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    # stub native-audio deps absent from this image; parity tests only touch
    # pure-Python reference functions, so the stubs are never actually called
    for missing in ("soundfile", "librosa", "vocos", "torch_ema"):
        if missing not in sys.modules:
            try:
                __import__(missing)
            except ImportError:
                sys.modules[missing] = types.ModuleType(missing)
    if "torchaudio" not in sys.modules:
        try:
            import torchaudio  # noqa: F401
        except ImportError:
            ta = types.ModuleType("torchaudio")
            ta.functional = types.ModuleType("torchaudio.functional")
            ta.transforms = types.SimpleNamespace(MelSpectrogram=None)
            sys.modules["torchaudio"] = ta
            sys.modules["torchaudio.functional"] = ta.functional
    for name, sub in [
        ("src", ""),
        ("src.utils", "utils"),
        ("src.models", "models"),
        ("src.data", "data"),
        ("src.training", "training"),
    ]:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = [str(REFERENCE_ROOT / "src" / sub if sub else REFERENCE_ROOT / "src")]
        sys.modules[name] = mod
