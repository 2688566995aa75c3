"""Numerical parity of the JAX DiT backbone against the reference torch DiT."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

TINY = dict(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, dropout=0.0,
    mel_dim=16, vocab_size=65, text_dim=32, conv_layers=2,
)


@pytest.fixture(scope="module")
def pair():
    """(torch DiT in eval mode, converted flax params, jax DiT)."""
    add_reference_to_path()
    from src.models.dit import DiT as TorchDiT

    from oron_tts_tpu.models.dit import DiT as JaxDiT
    from oron_tts_tpu.utils.torch_compat import convert_dit_state_dict

    torch.manual_seed(0)
    ref = TorchDiT(**TINY).eval()
    params = convert_dit_state_dict(
        ref.state_dict(), depth=TINY["depth"], conv_layers=TINY["conv_layers"]
    )
    model = JaxDiT(**TINY)
    return ref, {"params": params}, model


def _inputs(B=2, T=24, Nt=10, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, TINY["mel_dim"])).astype(np.float32)
    cond = rng.standard_normal((B, T, TINY["mel_dim"])).astype(np.float32)
    text = rng.integers(-1, 65, size=(B, Nt)).astype(np.int64)
    time = rng.uniform(0, 1, size=(B,)).astype(np.float32)
    lens = np.array([T, T - 7])
    mask = np.arange(T)[None, :] < lens[:, None]
    return x, cond, text, time, mask


def test_forward_parity_with_mask(pair):
    ref, variables, model = pair
    x, cond, text, time, mask = _inputs()
    with torch.no_grad():
        ref_out = ref(
            x=torch.from_numpy(x),
            cond=torch.from_numpy(cond),
            text=torch.from_numpy(text),
            time=torch.from_numpy(time),
            mask=torch.from_numpy(mask),
        ).numpy()
    ours = np.asarray(model.apply(variables, x, cond, text, time, mask=mask))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_forward_parity_no_mask(pair):
    ref, variables, model = pair
    x, cond, text, time, _ = _inputs(seed=2)
    with torch.no_grad():
        ref_out = ref(
            x=torch.from_numpy(x),
            cond=torch.from_numpy(cond),
            text=torch.from_numpy(text),
            time=torch.from_numpy(time),
        ).numpy()
    ours = np.asarray(model.apply(variables, x, cond, text, time))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_drop_flags_parity(pair):
    ref, variables, model = pair
    x, cond, text, time, mask = _inputs(seed=3)
    for drop_audio, drop_text in [(True, False), (True, True)]:
        with torch.no_grad():
            ref_out = ref(
                x=torch.from_numpy(x),
                cond=torch.from_numpy(cond),
                text=torch.from_numpy(text),
                time=torch.from_numpy(time),
                mask=torch.from_numpy(mask),
                drop_audio_cond=drop_audio,
                drop_text=drop_text,
            ).numpy()
        ours = np.asarray(
            model.apply(
                variables, x, cond, text, time, mask=mask,
                drop_audio_cond=drop_audio, drop_text=drop_text,
            )
        )
        np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_cfg_double_batch_parity(pair):
    ref, variables, model = pair
    x, cond, text, time, mask = _inputs(seed=4)
    with torch.no_grad():
        packed = ref(
            x=torch.from_numpy(x),
            cond=torch.from_numpy(cond),
            text=torch.from_numpy(text),
            time=torch.from_numpy(time),
            mask=torch.from_numpy(mask),
            cfg_infer=True,
            cache=True,
        ).numpy()
    ref.clear_cache()
    ref_pred, ref_null = packed[:2], packed[2:]

    te_cond = model.apply(
        variables, text, x.shape[1], False, method="embed_text"
    )
    te_uncond = model.apply(
        variables, text, x.shape[1], True, method="embed_text"
    )
    pred, null = model.apply(
        variables, x, cond, te_cond, te_uncond, time, mask, method="forward_cfg"
    )
    np.testing.assert_allclose(np.asarray(pred), ref_pred, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(null), ref_null, atol=2e-4, rtol=1e-3)


def test_zero_init_contract():
    """Fresh init: proj_out and AdaLN linears are zero → output is exactly 0."""
    import jax

    from oron_tts_tpu.models.dit import DiT as JaxDiT

    model = JaxDiT(**TINY)
    x, cond, text, time, mask = _inputs(seed=5)
    variables = model.init(jax.random.PRNGKey(0), x, cond, text, time, mask=mask)
    out = np.asarray(model.apply(variables, x, cond, text, time, mask=mask))
    assert np.abs(out).max() == 0.0
