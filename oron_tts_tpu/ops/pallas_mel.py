"""Fused Pallas log-mel kernel: framing → window → DFT → filterbank → log.

One kernel pass per block of frames: the signal lives in HBM as a
[rows, hop] matrix with n_fft/hop row-shifted views; each program DMAs the
aligned row blocks of all views and lane-concatenates them into the frame
matrix, then windows and runs the DFT basis + mel filterbank matmuls on
the MXU with f32 precision and writes the log-mel block — no [T, n_fft]
frames or [T, n_freqs] spectrogram ever hit HBM. Matches
ops.mel.log_mel_spectrogram to ~1e-5 and runs ~1.7x faster on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oron_tts_tpu.ops.dft import rdft_basis
from oron_tts_tpu.ops.mel import MelConfig, mel_filterbank, padded_hann_window


def _mel_kernel(*refs, block_t: int, hop: int, n_fft: int, log_clip: float):
    ratio = n_fft // hop  # 4 for the standard 1024/256 contract
    shifted = refs[:ratio]  # HBM views of the signal, pre-shifted by j rows
    win_ref, cos_ref, sin_ref, fb_ref, out_ref, span_ref, sem = refs[ratio:]
    i = pl.program_id(0)
    # frame j covers signal rows j..j+ratio-1; sublane-shifted views can't
    # be lane-concatenated in VMEM and odd DMA row offsets break the 8-row
    # tiling, so the j-shift is baked into per-input HBM views and every
    # DMA starts at the aligned row i*block_t
    dmas = [
        pltpu.make_async_copy(
            shifted[j].at[pl.ds(i * block_t, block_t), :],
            span_ref.at[j],
            sem.at[j],
        )
        for j in range(ratio)
    ]
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()

    frames = jnp.concatenate(
        [span_ref[j] for j in range(ratio)], axis=-1
    )  # [block_t, n_fft]
    frames = frames * win_ref[0]

    hi = jax.lax.Precision.HIGHEST  # mel fidelity needs true-f32 matmuls
    re = jax.lax.dot(frames, cos_ref[:], precision=hi,
                     preferred_element_type=jnp.float32)
    im = jax.lax.dot(frames, sin_ref[:], precision=hi,
                     preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jax.lax.dot(mag, fb_ref[:], precision=hi,
                      preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.log(jnp.maximum(mel, log_clip)).T


@functools.lru_cache(maxsize=4)
def _consts(cfg: MelConfig) -> tuple[np.ndarray, ...]:
    window = padded_hann_window(cfg.n_fft, cfg.win_length)[None, :]
    cos_b, sin_b = rdft_basis(cfg.n_fft)
    return window, cos_b, sin_b, mel_filterbank(cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "block_t", "interpret"))
def log_mel_pallas(
    audio: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    block_t: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """[L] waveform → [n_mels, 1 + L // hop] log-mel (Vocos contract)."""
    if cfg.n_fft % cfg.hop_length:
        raise ValueError("pallas mel requires hop | n_fft")
    hop, n_fft = cfg.hop_length, cfg.n_fft
    n_frames = 1 + audio.shape[-1] // hop
    n_blocks = -(-n_frames // block_t)

    pad = n_fft // 2
    padded = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    # cover the last block's span: start of final frame + n_fft, rounded to
    # whole hop rows (the kernel reads the signal as a [N, hop] matrix)
    ratio = n_fft // hop
    need = (n_blocks * block_t + ratio - 1) * hop
    # pad to a whole number of hop rows even when `need` is already covered:
    # reflect-pad yields L + n_fft samples, which is a hop multiple only
    # when L is — otherwise the reshape below would fail for the ~255 in
    # 65536 lengths whose final frame block is exactly full
    target = max(need, -(-padded.shape[0] // hop) * hop)
    padded = jnp.pad(padded, (0, target - padded.shape[0]))
    audio_rows = padded.reshape(-1, hop)
    n_rows = n_blocks * block_t
    shifted = [audio_rows[j: j + n_rows] for j in range(ratio)]

    window, cos_b, sin_b, fb = _consts(cfg)

    hbm = pl.BlockSpec(memory_space=pl.ANY)  # signal views stay in HBM
    out = pl.pallas_call(
        functools.partial(
            _mel_kernel, block_t=block_t, hop=hop, n_fft=n_fft,
            log_clip=cfg.log_clip,
        ),
        out_shape=jax.ShapeDtypeStruct((cfg.n_mels, n_blocks * block_t),
                                       jnp.float32),
        grid=(n_blocks,),
        in_specs=[hbm] * ratio + [
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cfg.n_mels, block_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ratio, block_t, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((ratio,)),
        ],
        interpret=interpret,
    )(*shifted, jnp.asarray(window), jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(fb))
    return out[:, :n_frames]
