"""Torch-checkpoint interop: key adaptation, EMA preference, shape-tolerant merge."""

import numpy as np
import pytest

from oron_tts_tpu.utils.torch_compat import (
    merge_compatible,
    strip_compiled_prefix,
    strip_prefix,
)

torch = pytest.importorskip("torch")


def test_strip_compiled_prefix():
    sd = {"cfm.backbone._orig_mod.proj_out.weight": 1,
          "cfm.backbone.proj_out.bias": 2}
    out = strip_compiled_prefix(sd)
    assert "cfm.backbone.proj_out.weight" in out
    assert "cfm.backbone.proj_out.bias" in out


def test_strip_prefix():
    sd = {"cfm.backbone.a": 1, "other.b": 2}
    assert strip_prefix(sd, "cfm.backbone.") == {"a": 1}


def test_merge_compatible_skips_mismatched():
    params = {
        "text_embed": {"embed": {"embedding": np.zeros((66, 32), np.float32)}},
        "proj_out": {"kernel": np.zeros((4, 2), np.float32)},
    }
    loaded = {
        "text_embed": {"embed": {"embedding": np.ones((100, 32), np.float32)}},
        "proj_out": {"kernel": np.full((4, 2), 7.0, np.float32)},
    }
    merged, skipped = merge_compatible(params, loaded)
    # mismatched embedding kept from base, matching kernel overlaid
    assert (merged["text_embed"]["embed"]["embedding"] == 0).all()
    assert (merged["proj_out"]["kernel"] == 7.0).all()
    assert skipped == ["text_embed/embed/embedding"]


def test_load_torch_checkpoint_prefers_ema(tmp_path):
    from oron_tts_tpu.utils.torch_compat import load_torch_checkpoint

    ckpt = {
        "model_state_dict": {"w": torch.zeros(3)},
        "ema_state_dict": {"w": torch.ones(3)},
        "step": 5,
    }
    path = tmp_path / "c.pt"
    torch.save(ckpt, path)
    sd = load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(sd["w"], np.ones(3))


def test_roundtrip_reference_checkpoint_into_jax(tmp_path):
    """Full path: reference torch F5TTS checkpoint → jax params → same output."""
    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    from src.models.dit import DiT as TorchDiT

    from oron_tts_tpu.models.dit import DiT as JaxDiT
    from oron_tts_tpu.utils.torch_compat import (
        convert_f5tts_state_dict,
        load_torch_checkpoint,
    )

    tiny = dict(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, dropout=0.0,
                mel_dim=8, vocab_size=65, text_dim=16, conv_layers=1)
    torch.manual_seed(1)
    ref = TorchDiT(**tiny).eval()
    sd = {f"cfm.backbone.{k}": v for k, v in ref.state_dict().items()}
    path = tmp_path / "ref.pt"
    torch.save({"ema_state_dict": sd}, path)

    loaded = load_torch_checkpoint(str(path))
    params = convert_f5tts_state_dict(loaded, depth=1, conv_layers=1)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 8)).astype(np.float32)
    text = rng.integers(0, 65, (1, 16)).astype(np.int64)
    t = np.array([0.4], np.float32)
    with torch.no_grad():
        ref_out = ref(
            x=torch.from_numpy(x), cond=torch.from_numpy(x),
            text=torch.from_numpy(text), time=torch.from_numpy(t),
        ).numpy()
    ours = np.asarray(
        JaxDiT(**tiny).apply({"params": params}, x, x, text, t)
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_export_roundtrip_into_torch_reference():
    """flax params → torch state dict → reference model → same output."""
    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    import jax

    from src.models.dit import DiT as TorchDiT

    from oron_tts_tpu.models.dit import DiT as JaxDiT
    from oron_tts_tpu.utils.torch_compat import export_dit_state_dict

    tiny = dict(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, dropout=0.0,
                mel_dim=8, vocab_size=65, text_dim=16, conv_layers=1)
    jmodel = JaxDiT(**tiny)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 24, 8)).astype(np.float32)
    text = rng.integers(-1, 65, (2, 24)).astype(np.int64)
    t = np.array([0.3, 0.8], np.float32)
    variables = jmodel.init(
        jax.random.PRNGKey(3), x, x, text.astype(np.int32), t
    )
    # randomize the zero-init outputs so the comparison is nontrivial
    variables = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 0.01 * rng.standard_normal(a.shape).astype(
            np.asarray(a).dtype
        ),
        variables,
    )
    jax_out = np.asarray(
        jmodel.apply(variables, x, x, text.astype(np.int32), t)
    )

    sd = export_dit_state_dict(variables["params"])
    ref = TorchDiT(**tiny)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all("inv_freq" in k for k in missing)  # torch-side derived buffer
    ref.eval()
    with torch.no_grad():
        torch_out = ref(
            x=torch.from_numpy(x), cond=torch.from_numpy(x),
            text=torch.from_numpy(text), time=torch.from_numpy(t),
        ).numpy()
    np.testing.assert_allclose(jax_out, torch_out, atol=2e-4, rtol=1e-3)
