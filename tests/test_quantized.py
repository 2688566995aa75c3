"""Int8 serving path (ops/quantized_matmul.py, QDense, quantize_for_serving).

No reference analogue (the reference serves fp32/fp16 torch weights) —
these pin the framework's own contract: per-channel symmetric weight
quantization, Pallas-kernel == XLA-reference math, bounded end-to-end
sampler deviation, and the param-tree conversion matching QDense's
expected structure for both block layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oron_tts_tpu.ops.quantized_matmul import (
    dequantize_weight,
    quantize_weight,
    quantized_matmul,
    quantized_matmul_ref,
    w8a8_matmul,
)

TINY = {
    "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2, "ff_mult": 2,
    "text_dim": 32, "conv_layers": 2, "p_dropout": 0.0,
}


def test_quantize_weight_properties():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
    w = w.at[:, :3].set(0.0)  # zero-init heads must stay exact
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (64,)
    deq = dequantize_weight(q, s, jnp.float32)
    assert float(jnp.max(jnp.abs(deq[:, :3]))) == 0.0
    # symmetric per-channel error bound: |w - deq| <= scale/2 per column
    assert float(jnp.max(jnp.abs(w - deq) - s[None, :] / 2)) <= 1e-6
    # stacked (scan) layout quantizes per (depth, channel)
    ws = jnp.stack([w, 3.0 * w])
    qs, ss = quantize_weight(ws)
    assert qs.shape == ws.shape and ss.shape == (2, 64)
    # nonzero columns scale linearly; all-zero columns pin scale to 1
    np.testing.assert_allclose(np.asarray(ss[1, 3:]),
                               np.asarray(3.0 * ss[0, 3:]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ss[:, :3]), 1.0)


@pytest.mark.parametrize("m,k,n", [(13, 96, 64), (8, 64, 128), (2, 256, 384)])
def test_pallas_kernel_matches_ref(m, k, n):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    q, s = quantize_weight(w)
    out = quantized_matmul(x, q, s, interpret=True)
    ref = quantized_matmul_ref(x, q, s)
    # interpret-mode dot and XLA dot_general order f32 sums differently
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-5)
    # and both approximate the full-precision product
    full = x @ w
    rel = float(jnp.linalg.norm(ref - full) / jnp.linalg.norm(full))
    assert rel < 0.02, rel


def test_pallas_kernel_leading_dims():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q, s = quantize_weight(w)
    out = quantized_matmul(x, q, s, interpret=True)
    assert out.shape == (2, 5, 32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(quantized_matmul_ref(x, q, s)), atol=1e-5
    )


def test_w8a8_error_bound():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    q, s = quantize_weight(w)
    full = x @ w
    rel = float(
        jnp.linalg.norm(w8a8_matmul(x, q, s) - full) / jnp.linalg.norm(full)
    )
    assert rel < 0.03, rel


def _tiny_model(scan_blocks: bool, seed: int = 1):
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = F5Config.from_dict({"model": dict(TINY)})
    model = F5TTS(cfg, dtype=jnp.float32, scan_blocks=scan_blocks)
    v = model.init_params(0)
    rng = np.random.default_rng(seed)
    model.variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        v,
    )
    return model


@pytest.mark.parametrize("scan_blocks", [False, True])
@pytest.mark.parametrize("mode,tol", [("int8", 0.01), ("int8_dynamic", 0.03)])
def test_quantized_sampling_deviation(scan_blocks, mode, tol):
    model = _tiny_model(scan_blocks)
    cond = jnp.zeros((1, 64, 100))
    ids = jnp.ones((1, 64), jnp.int32)
    kw = dict(steps=4, cfg_strength=2.0, seed=0)
    ref, _ = model.cfm.sample(
        model.variables, cond, ids, jnp.array([64]), jnp.array([0]), **kw
    )
    model.quantize_for_serving(mode)
    assert model.quant_mode == mode
    out, _ = model.cfm.sample(
        model.variables, cond, ids, jnp.array([64]), jnp.array([0]), **kw
    )
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < tol, f"{mode} rel err {rel}"


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_quantized_params_match_qdense_structure(scan_blocks):
    """quantize_dit_params output applies cleanly through QDense modules."""
    from oron_tts_tpu.models.dit import quantize_dit_params

    model = _tiny_model(scan_blocks)
    qparams = quantize_dit_params(model.variables["params"])
    qdit = model.backbone.clone(quant="int8")
    x = jnp.zeros((1, 32, 100))
    ids = jnp.zeros((1, 32), jnp.int32)
    init_params = qdit.init(
        jax.random.PRNGKey(0), x, x, ids, jnp.zeros((1,))
    )["params"]
    same = jax.tree_util.tree_structure(init_params) == \
        jax.tree_util.tree_structure(qparams)
    assert same, "converted tree structure != QDense init structure"
    # shapes and dtypes line up leaf-by-leaf
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(init_params),
        jax.tree_util.tree_leaves_with_path(qparams),
    ):
        assert pa == pb and a.shape == b.shape, (pa, a.shape, b.shape)


def test_quantize_guards():
    model = _tiny_model(False)
    with pytest.raises(ValueError):
        model.quantize_for_serving("int4")
    model.quantize_for_serving("int8")
    # w8a16 + mesh are mutually exclusive (no GSPMD rule for the Pallas
    # kernel); w8a8 composes (tested below)
    from oron_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    with pytest.raises(NotImplementedError):
        model.set_mesh(mesh)
    fresh = _tiny_model(False)
    fresh.set_mesh(mesh)
    with pytest.raises(NotImplementedError):
        fresh.quantize_for_serving("int8")


def _tiny_serving_model(mesh=None, quant=None):
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.models.vocos import VocosDecoder

    cfg = {"model": {**TINY, "heads": 4, "conv_layers": 1}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    if quant:
        model.quantize_for_serving(quant)
    if mesh is not None:
        model.set_mesh(mesh)
    vocoder = VocosDecoder(dim=32, n_layers=1, intermediate_dim=64)
    voc_vars = vocoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 100, 16), jnp.float32)
    )
    model.set_vocoder(vocoder, voc_vars)
    return model


def test_w8a8_mesh_serving_matches_single_device():
    """int8_dynamic composes with the dp x tp serving mesh.

    The s8 dot is plain XLA dot_general, so GSPMD shards it under the
    kernel_q/scale rules (parallel/mesh.py): the row-parallel layers
    psum exact int32 partials and the per-token amax all-reduces, so the
    quantized math matches single-device up to f32 reduction reordering
    in the surrounding full-precision ops.
    """
    from oron_tts_tpu.parallel.mesh import make_mesh, param_specs
    from jax.sharding import PartitionSpec as P

    texts = [f"сайн байна уу та нар {i}" for i in range(8)]
    ref = _tiny_serving_model(None, "int8_dynamic").synthesize_batch(
        texts, n_steps=2, seed=0
    )
    tp = _tiny_serving_model(make_mesh(4, 2), "int8_dynamic")
    # the quantized leaves got real TP specs, not the P() fallback
    specs = param_specs(tp.variables["params"])
    assert specs["block0"]["attn"]["to_q"]["kernel_q"] == P(None, "model")
    assert specs["block0"]["attn"]["to_q"]["scale"] == P("model")
    assert specs["block0"]["ff"]["out_proj"]["kernel_q"] == P("model", None)
    assert specs["block0"]["ff"]["out_proj"]["scale"] == P()
    out = tp.synthesize_batch(texts, n_steps=2, seed=0)
    assert len(ref) == len(out) == 8
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_w8a8_quantize_after_set_mesh():
    """quantize_for_serving('int8_dynamic') re-shards when a mesh is live."""
    from oron_tts_tpu.parallel.mesh import make_mesh

    model = _tiny_serving_model(None)
    model.set_mesh(make_mesh(4, 2))
    model.quantize_for_serving("int8_dynamic")
    wav = model.synthesize("сайн байна уу", n_steps=2, seed=0)
    assert wav.ndim == 1 and wav.size > 0
    assert np.isfinite(wav).all()
