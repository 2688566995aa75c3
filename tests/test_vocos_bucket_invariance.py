"""VocosDecoder lens-masked decode is bucket-invariant.

The batched serving contract (models/f5tts.py _decode_mel_group_lazy)
promises row i's first lens[i]*hop samples match its solo decode exactly,
no matter how many pad frames its length group appended. That requires:
activations re-zeroed beyond lens after every conv block (pad frames carry
bias-propagated values that leak back through the ~27-frame receptive
field), pad-frame STFT coefficients zeroed, and a per-row OLA window
envelope (ops/stft.py istft_real lens=...) — the full-bucket envelope
normalizes the last ~n_fft samples differently per pad count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.models.vocos import VocosDecoder


def _mel(rng, b, t):
    return jnp.asarray(rng.standard_normal((b, 100, t)), jnp.float32)


@pytest.mark.parametrize("head_mode,normalized_pad", [
    ("mag_phase", 64), ("real_imag", 64), ("mag_phase", 1),
])
def test_lens_masked_decode_bucket_invariant(head_mode, normalized_pad):
    """Same mel decoded at bucket T and at bucket T+pad (lens=T) must give
    identical first T*hop samples — including the last n_fft samples,
    where the window envelope used to be bucket-dependent, and the last
    ~27 frames, where conv receptive fields used to see pad activations."""
    rng = np.random.default_rng(0)
    T, pad, hop = 96, normalized_pad, 64
    voc = VocosDecoder(dim=64, n_layers=2, intermediate_dim=128,
                       n_fft=256, hop_length=hop, head_mode=head_mode)
    mel = _mel(rng, 1, T)
    variables = voc.init(jax.random.PRNGKey(0), mel)

    lens = jnp.asarray([T], jnp.int32)
    exact = voc.apply(variables, mel, lens)
    padded_mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)))
    # caller contract: mel beyond lens is zeroed (f5tts zeroes it)
    padded = voc.apply(variables, padded_mel, lens)

    n = T * hop
    np.testing.assert_allclose(
        np.asarray(padded)[:, :n], np.asarray(exact)[:, :n],
        rtol=1e-5, atol=1e-6,
    )


def test_lens_masked_rows_independent_of_neighbors():
    """In a batch, each row's output depends only on its own mel: decoding
    [row_a, row_b] gives row_a the same samples as decoding it alone."""
    rng = np.random.default_rng(1)
    T, hop = 128, 64
    voc = VocosDecoder(dim=64, n_layers=2, intermediate_dim=128,
                       n_fft=256, hop_length=hop, head_mode="mag_phase")
    mel = _mel(rng, 2, T)
    la, lb = 100, 128
    valid = (np.arange(T)[None, :] < np.asarray([la, lb])[:, None])
    mel = jnp.where(jnp.asarray(valid)[:, None, :], mel, 0.0)
    variables = voc.init(jax.random.PRNGKey(0), mel)

    both = voc.apply(variables, mel, jnp.asarray([la, lb], jnp.int32))
    solo_a = voc.apply(variables, mel[:1], jnp.asarray([la], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(both)[0, : la * hop], np.asarray(solo_a)[0, : la * hop],
        rtol=1e-5, atol=1e-6,
    )


def test_no_lens_unchanged_full_envelope():
    """lens=None keeps the plain full-frame decode (official-parity path)."""
    rng = np.random.default_rng(2)
    voc = VocosDecoder(dim=64, n_layers=2, intermediate_dim=128,
                       n_fft=256, hop_length=64, head_mode="mag_phase")
    mel = _mel(rng, 1, 64)
    variables = voc.init(jax.random.PRNGKey(0), mel)
    out = voc.apply(variables, mel)
    full = voc.apply(variables, mel, jnp.asarray([64], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full), rtol=1e-5, atol=1e-6,
    )
