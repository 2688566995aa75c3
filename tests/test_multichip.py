"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_mesh_and_param_specs():
    from jax.sharding import PartitionSpec as P

    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.parallel.mesh import make_mesh, param_specs

    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    model = DiT(dim=64, depth=1, heads=4, dim_head=16, mel_dim=8,
                text_dim=16, conv_layers=1, dropout=0.0)
    import jax.numpy as jnp

    x = jnp.zeros((1, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, x,
                           jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,)))
    specs = param_specs(variables["params"])
    assert specs["block0"]["attn"]["to_q"]["kernel"] == P(None, "model")
    assert specs["block0"]["attn"]["to_out"]["kernel"] == P("model", None)
    assert specs["block0"]["ff"]["in_proj"]["kernel"] == P(None, "model")
    assert specs["proj_out"]["kernel"] == P()


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dp_equals_single_device_loss():
    """Sharded train step computes the same loss as unsharded."""
    import jax.numpy as jnp

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = {
        "sample_rate": 24000, "n_mels": 100, "learning_rate": 1e-4,
        "warmup_steps": 2, "num_epochs": 1, "use_tqdm": False,
        "model": {"vocab_size": 65, "dim": 32, "depth": 1, "heads": 2,
                  "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                  "p_dropout": 0.0},
    }

    class _Loader:
        dataset = []

        def __len__(self):
            return 1

        def __iter__(self):
            return iter(())

    rng = np.random.default_rng(0)
    B, T = 8, 64
    batch = {
        "mel": rng.standard_normal((B, 100, T)).astype(np.float32),
        "text_ids": rng.integers(0, 65, (B, T)).astype(np.int32),
        "mel_lengths": np.full((B,), T, np.int32),
    }

    def run(mesh):
        model = F5TTS.from_config(F5Config.from_dict(cfg))
        model.init_params(0)
        tr = F5Trainer(config=cfg, model=model, train_loader=_Loader(),
                       log_dir="/tmp/l", checkpoint_dir="/tmp/c", mesh=mesh)
        b = shard_batch(mesh, batch) if mesh is not None else batch
        state, metrics = tr._train_step(tr.state, b, jax.random.PRNGKey(1))
        return float(metrics["loss"]), state

    loss_1, _ = run(None)
    loss_8, state = run(make_mesh(8, 1))
    assert np.isclose(loss_1, loss_8, rtol=1e-5), (loss_1, loss_8)
    jax.block_until_ready(state.params)


def test_tp_matches_dp_loss():
    """4x2 (dp x tp) sharded step computes the same loss as unsharded."""
    import jax.numpy as jnp  # noqa: F401

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = {
        "sample_rate": 24000, "n_mels": 100, "learning_rate": 1e-4,
        "warmup_steps": 2, "num_epochs": 1, "use_tqdm": False,
        "model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 4,
                  "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                  "p_dropout": 0.0},
    }

    class _Loader:
        dataset = []

        def __len__(self):
            return 1

        def __iter__(self):
            return iter(())

    rng = np.random.default_rng(3)
    B, T = 4, 64
    batch = {
        "mel": rng.standard_normal((B, 100, T)).astype(np.float32),
        "text_ids": rng.integers(0, 65, (B, T)).astype(np.int32),
        "mel_lengths": np.full((B,), T, np.int32),
    }

    def run(mesh):
        model = F5TTS.from_config(F5Config.from_dict(cfg))
        model.init_params(0)
        tr = F5Trainer(config=cfg, model=model, train_loader=_Loader(),
                       log_dir="/tmp/l2", checkpoint_dir="/tmp/c2", mesh=mesh)
        b = shard_batch(mesh, batch) if mesh is not None else batch
        state, metrics = tr._train_step(tr.state, b, jax.random.PRNGKey(5))
        # updated params must also agree — pull one TP-sharded leaf
        leaf = np.asarray(
            jax.device_get(state.params["block0"]["ff"]["in_proj"]["kernel"])
        )
        return float(metrics["loss"]), leaf

    loss_ref, leaf_ref = run(None)
    loss_tp, leaf_tp = run(make_mesh(4, 2))
    assert np.isclose(loss_ref, loss_tp, rtol=1e-5), (loss_ref, loss_tp)
    np.testing.assert_allclose(leaf_tp, leaf_ref, atol=1e-5)


def test_param_specs_scan_layout_shift():
    """Stacked scan_blocks params get the depth axis left unsharded."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.parallel.mesh import param_specs

    model = DiT(dim=64, depth=2, heads=4, dim_head=16, mel_dim=8,
                text_dim=16, conv_layers=1, dropout=0.0, scan_blocks=True)
    x = jnp.zeros((1, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, x,
                           jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,)))
    specs = param_specs(variables["params"])
    # stacked leaves are [depth, in, out]: rule axes shift right by one
    assert specs["blocks"]["attn"]["to_q"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["attn"]["to_out"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["ff"]["in_proj"]["kernel"] == P(None, None, "model")
    assert specs["proj_out"]["kernel"] == P()


def _tiny_serving_model(mesh=None):
    import jax.numpy as jnp

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.models.vocos import VocosDecoder

    cfg = {
        "sample_rate": 24000, "n_mels": 100,
        "model": {"vocab_size": 65, "dim": 64, "depth": 2, "heads": 4,
                  "ff_mult": 2, "text_dim": 32, "conv_layers": 1,
                  "p_dropout": 0.0},
    }
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    vocoder = VocosDecoder(dim=32, n_layers=1, intermediate_dim=64)
    voc_vars = vocoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 100, 16), jnp.float32)
    )
    if mesh is not None:
        model.set_mesh(mesh)
    model.set_vocoder(vocoder, voc_vars)
    return model


def test_mesh_serving_matches_single_device():
    """synthesize_batch under a dp x tp mesh == single-device output.

    Eight similar-length texts form ONE group both ways (row padding is a
    no-op at 8 rows for both the even rule and the data-axis multiple), so
    per-(row, frame) noise folds identically and outputs must agree up to
    f32 reduction reordering from the TP psum.
    """
    from oron_tts_tpu.parallel.mesh import make_mesh

    texts = [f"сайн байна уу та нар {i}" for i in range(8)]

    ref = _tiny_serving_model(None).synthesize_batch(texts, n_steps=2, seed=0)
    tp = _tiny_serving_model(make_mesh(4, 2)).synthesize_batch(
        texts, n_steps=2, seed=0
    )
    assert len(ref) == len(tp) == 8
    for a, b in zip(ref, tp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_mesh_serving_single_utterance_smoke():
    """The B=1 chunked synthesize() path works under a mesh (replicated
    batch, TP-sharded math)."""
    from oron_tts_tpu.parallel.mesh import make_mesh

    model = _tiny_serving_model(make_mesh(4, 2))
    wav = model.synthesize("сайн байна уу", n_steps=2, seed=0)
    assert wav.ndim == 1 and wav.size > 0
    assert np.isfinite(wav).all()


def test_zero1_opt_sharding_matches_replicated():
    """shard_opt_states=True (ZeRO-1, mesh.opt_specs): AdamW moments shard
    over the data axis; two train steps produce the same losses and
    updated params as the replicated-optimizer run, and the moment leaves
    really carry a 'data' sharding."""
    from jax.sharding import PartitionSpec as P

    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS
    from oron_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from oron_tts_tpu.train.trainer import F5Trainer

    base_cfg = {
        "sample_rate": 24000, "n_mels": 100, "learning_rate": 1e-4,
        "warmup_steps": 2, "num_epochs": 1, "use_tqdm": False,
        "model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 4,
                  "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                  "p_dropout": 0.0},
    }

    class _Loader:
        dataset = []

        def __len__(self):
            return 1

        def __iter__(self):
            return iter(())

    rng = np.random.default_rng(7)
    B, T = 8, 64
    batch = {
        "mel": rng.standard_normal((B, 100, T)).astype(np.float32),
        "text_ids": rng.integers(0, 65, (B, T)).astype(np.int32),
        "mel_lengths": np.full((B,), T, np.int32),
    }

    def run(zero1: bool):
        cfg = dict(base_cfg, shard_opt_states=zero1)
        mesh = make_mesh(4, 2)
        model = F5TTS.from_config(F5Config.from_dict(cfg))
        model.init_params(0)
        tr = F5Trainer(config=cfg, model=model, train_loader=_Loader(),
                       log_dir="/tmp/lz", checkpoint_dir="/tmp/cz",
                       mesh=mesh)
        if zero1:
            # mu/nu leaves shard over data (kernels: data on the first
            # free axis alongside the TP spec); scalar count stays P()
            adam = tr.state.opt_state[1][0]  # chain: (clip, (adamw...))
            mu_leaf = adam.mu["block0"]["ff"]["in_proj"]["kernel"]
            spec = mu_leaf.sharding.spec
            assert "data" in tuple(spec), spec
            assert adam.count.sharding.spec == P(), adam.count.sharding
        b = shard_batch(mesh, batch)
        state = tr.state
        losses = []
        for i in range(2):
            state, metrics = tr._train_step(
                state, b, jax.random.PRNGKey(11 + i)
            )
            losses.append(float(metrics["loss"]))
        leaf = np.asarray(
            jax.device_get(state.params["block0"]["ff"]["in_proj"]["kernel"])
        )
        return losses, leaf

    losses_rep, leaf_rep = run(False)
    losses_z1, leaf_z1 = run(True)
    np.testing.assert_allclose(losses_z1, losses_rep, rtol=1e-5)
    np.testing.assert_allclose(leaf_z1, leaf_rep, atol=1e-5)
