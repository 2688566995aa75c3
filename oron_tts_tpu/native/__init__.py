"""ctypes bindings for the native audio frontend (native/audiokit.cpp).

The library is built on first use (``make -C native``) and cached; every
entry point has a pure-Python fallback, so the framework works without a
toolchain. ctypes releases the GIL during calls, so dataloader worker
threads extract features truly in parallel.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)
_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaudiokit.so"

_lib: ctypes.CDLL | None = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as exc:
        _logger.info("audiokit build skipped: %s", exc)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.audiokit_log_mel.restype = ctypes.c_int
        lib.audiokit_log_mel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.audiokit_mel_frames.restype = ctypes.c_int64
        lib.audiokit_mel_frames.argtypes = [ctypes.c_int64, ctypes.c_int]
        lib.audiokit_normalize_peak.restype = None
        lib.audiokit_normalize_peak.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        _lib = lib
        _logger.info("audiokit native library loaded")
    except OSError as exc:
        _logger.info("audiokit load failed: %s", exc)
    return _lib


def available() -> bool:
    return get_lib() is not None


def log_mel(audio: np.ndarray, sample_rate: int, n_fft: int, hop: int,
            win_length: int, n_mels: int) -> np.ndarray | None:
    """Native log-mel [n_mels, T]; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    t_frames = int(lib.audiokit_mel_frames(len(audio), hop))
    out = np.empty((n_mels, t_frames), dtype=np.float32)
    rc = lib.audiokit_log_mel(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio), sample_rate, n_fft, hop, win_length, n_mels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out


def normalize_peak_inplace(audio: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None or audio.dtype != np.float32 or not audio.flags.c_contiguous:
        return False
    lib.audiokit_normalize_peak(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio)
    )
    return True
