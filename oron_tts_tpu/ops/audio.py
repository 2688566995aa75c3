"""AudioProcessor facade: the numerical contract of the system in JAX.

API parity with reference src/utils/audio.py:33-113 (load/save/normalize/
trim/mel), but device-side compute is JAX and host-side I/O is the
self-contained wav codec.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from oron_tts_tpu.data import wav as wavio
from oron_tts_tpu.ops.mel import MelConfig, log_mel_spectrogram_jit

DEFAULT_SAMPLE_RATE = 24000
DEFAULT_N_MELS = 100
DEFAULT_N_FFT = 1024
DEFAULT_HOP_LENGTH = 256
DEFAULT_WIN_LENGTH = 1024


class AudioProcessor:
    def __init__(
        self,
        sample_rate: int = DEFAULT_SAMPLE_RATE,
        n_fft: int = DEFAULT_N_FFT,
        hop_length: int = DEFAULT_HOP_LENGTH,
        win_length: int = DEFAULT_WIN_LENGTH,
        n_mels: int = DEFAULT_N_MELS,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        self.mel_config = MelConfig(
            sample_rate=sample_rate,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            n_mels=n_mels,
        )

    def load_audio(self, path: str | Path) -> tuple[np.ndarray, int]:
        """Load, downmix to mono, resample to the configured rate."""
        samples, sr = wavio.read_wav(path)
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        if sr != self.sample_rate:
            samples = wavio.resample(samples, sr, self.sample_rate)
        return samples.astype(np.float32), self.sample_rate

    def save_audio(self, path: str | Path, audio: np.ndarray) -> None:
        wavio.write_wav(path, np.asarray(audio), self.sample_rate)

    def normalize_audio(self, audio: np.ndarray) -> np.ndarray:
        return wavio.normalize_peak(np.asarray(audio))

    def trim_silence(
        self,
        audio: np.ndarray,
        top_db: float = 20.0,
        frame_length: int = 2048,
        hop_length: int = 512,
    ) -> np.ndarray:
        return wavio.trim_silence(
            np.asarray(audio), top_db=top_db,
            frame_length=frame_length, hop_length=hop_length,
        )

    def mel_spectrogram(self, audio: np.ndarray | jnp.ndarray) -> jnp.ndarray:
        """Log-mel [n_mels, T] (or [..., n_mels, T] for batched input).

        A [1, L] input collapses to [n_mels, T] like the reference
        (audio.py:94-110 squeezes the channel dim).
        """
        arr = jnp.asarray(audio, dtype=jnp.float32)
        if arr.ndim == 2 and arr.shape[0] == 1:
            arr = arr[0]
        if arr.ndim == 1 and jax.default_backend() == "tpu":
            from oron_tts_tpu.ops.pallas_mel import log_mel_pallas

            return log_mel_pallas(arr, self.mel_config)
        return log_mel_spectrogram_jit(arr, self.mel_config)

    def get_audio_duration(self, audio: np.ndarray) -> float:
        return len(audio) / self.sample_rate
