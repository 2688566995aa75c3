"""End-to-end parity of the CFM sampler and eval loss vs the torch reference.

This is the mel-MAE fidelity check from BASELINE.md: same weights (converted),
same initial noise (captured from the torch generator), same solver settings
→ elementwise-comparable mel output.
"""

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
N_MELS = TINY["mel_dim"]


@pytest.fixture(scope="module")
def models():
    add_reference_to_path()
    from src.models.dit import DiT as TorchDiT
    from src.models.flow import CFM as TorchCFM

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT as JaxDiT
    from oron_tts_tpu.utils.torch_compat import convert_dit_state_dict

    torch.manual_seed(7)
    t_backbone = TorchDiT(**TINY)
    # give proj_out nonzero weights so the ODE actually moves
    with torch.no_grad():
        t_backbone.proj_out.weight.normal_(0, 0.02)
        t_backbone.proj_out.bias.normal_(0, 0.02)
    t_cfm = TorchCFM(t_backbone, n_mels=N_MELS).eval()

    params = convert_dit_state_dict(
        t_backbone.state_dict(), depth=TINY["depth"], conv_layers=TINY["conv_layers"]
    )
    j_cfm = CFM(JaxDiT(**TINY), CFMConfig(n_mels=N_MELS))
    return t_cfm, j_cfm, {"params": params}


def _torch_noise_like_reference(durations, max_dur, seed):
    """Replicate flow.py:269-283 per-sample generator draws + pad_sequence."""
    g = torch.Generator().manual_seed(seed)
    rows = [torch.randn(int(d), N_MELS, generator=g) for d in durations]
    out = torch.zeros(len(durations), max_dur, N_MELS)
    for i, r in enumerate(rows):
        out[i, : r.shape[0]] = r
    return out


@pytest.mark.parametrize("cfg_strength,sway", [(2.0, -1.0), (0.0, None)])
def test_sampler_mel_parity(models, cfg_strength, sway):
    t_cfm, j_cfm, variables = models
    B, T_ref, T_total, steps = 2, 12, 48, 8
    rng = np.random.default_rng(0)
    ref_mel = rng.standard_normal((B, T_ref, N_MELS)).astype(np.float32)
    text = rng.integers(0, 65, size=(B, T_total)).astype(np.int64)
    durations = [T_total, T_total - 9]
    lens = np.array([T_ref, T_ref - 5], dtype=np.int64)
    seed = 123

    with torch.inference_mode():
        t_out, t_traj = t_cfm.sample(
            cond=torch.from_numpy(ref_mel),
            text_ids=torch.from_numpy(text),
            duration=torch.tensor(durations),
            lens=torch.from_numpy(lens),
            steps=steps,
            cfg_strength=cfg_strength,
            sway_sampling_coef=sway,
            seed=seed,
        )
    noise = _torch_noise_like_reference(durations, T_total, seed).numpy()

    cond_padded = np.zeros((B, T_total, N_MELS), dtype=np.float32)
    cond_padded[:, :T_ref] = ref_mel

    j_out, _ = j_cfm.sample(
        variables,
        cond=cond_padded,
        text_ids=text,
        duration=np.array(durations),
        lens=lens,
        steps=steps,
        cfg_strength=cfg_strength,
        sway_sampling_coef=sway,
        noise=noise,
    )
    j_out = np.asarray(j_out)
    t_out = t_out.numpy()
    assert j_out.shape == t_out.shape
    mae = np.abs(j_out - t_out).mean()
    assert mae < 1e-2, f"mel MAE too high: {mae}"
    np.testing.assert_allclose(j_out, t_out, atol=5e-3, rtol=1e-2)


def test_eval_loss_parity(models):
    t_cfm, j_cfm, variables = models
    B, T = 3, 40
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((B, N_MELS, T)).astype(np.float32)
    text = rng.integers(-1, 65, size=(B, T)).astype(np.int64)
    lens = np.array([T, T - 10, T - 3], dtype=np.int64)

    t_cfm.eval()
    with torch.no_grad():
        ref_loss = t_cfm(
            torch.from_numpy(mel),
            torch.from_numpy(text),
            lens=torch.from_numpy(lens),
        ).item()

    # inject the exact eval-mode noise the reference draws (generator seed 0)
    gen = torch.Generator().manual_seed(0)
    x0 = torch.randn((B, T, N_MELS), generator=gen).numpy()

    import jax

    j_loss = float(
        j_cfm.loss(
            variables,
            mel,
            text,
            lens,
            rng=jax.random.PRNGKey(0),
            train=False,
            x0=x0,
        )
    )
    assert abs(j_loss - ref_loss) < 1e-3, (j_loss, ref_loss)


def test_train_loss_sane(models):
    _, j_cfm, variables = models
    import jax

    B, T = 2, 32
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((B, N_MELS, T)).astype(np.float32)
    text = rng.integers(0, 65, size=(B, T)).astype(np.int64)
    lens = np.array([T, T - 6], dtype=np.int64)

    losses = [
        float(j_cfm.loss(variables, mel, text, lens, rng=jax.random.PRNGKey(s)))
        for s in range(4)
    ]
    assert all(np.isfinite(losses))
    # flow-matching MSE against ~N(0,2) targets with near-zero pred ≈ 2
    assert 0.5 < np.mean(losses) < 8.0

    # gradients flow and are finite
    def loss_fn(params):
        return j_cfm.loss(
            {"params": params}, mel, text, lens, rng=jax.random.PRNGKey(1)
        )

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
