"""Numerical proof of the official-Vocos weight port (VERDICT r1 #3).

Builds a from-scratch torch replica of the official charactr/vocos-mel-24khz
architecture (VocosBackbone: Conv1d embed → LayerNorm → 8× ConvNeXtBlock
with layer-scale gamma → final LayerNorm; ISTFTHead: Linear → exp/clip
magnitude + phase → "same"-padding ISTFT), gives it random weights in the
official state_dict key layout, runs them through convert_vocos_state_dict,
and asserts the JAX VocosDecoder reproduces the torch waveform to <1e-4.

This validates every tensor-layout decision in the converter (conv OIW→WIO,
linear transpose, gamma passthrough) and the mag/phase + same-trim ISTFT
numerics — the exact path real pretrained weights would ride.
"""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from oron_tts_tpu.models.vocos import VocosDecoder, convert_vocos_state_dict  # noqa: E402


class _ConvNeXtBlock(nn.Module):
    """Official vocos.models.ConvNeXtBlock (no AdaLayerNorm variant)."""

    def __init__(self, dim: int, intermediate_dim: int, layer_scale: float):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, kernel_size=7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(layer_scale * torch.ones(dim))

    def forward(self, x: torch.Tensor) -> torch.Tensor:  # [B, C, T]
        residual = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = self.act(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        x = x.transpose(1, 2)
        return residual + x


class _Backbone(nn.Module):
    def __init__(self, in_ch: int, dim: int, inter: int, n_layers: int):
        super().__init__()
        self.embed = nn.Conv1d(in_ch, dim, kernel_size=7, padding=3)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList(
            _ConvNeXtBlock(dim, inter, layer_scale=1.0 / n_layers)
            for _ in range(n_layers)
        )
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x: torch.Tensor) -> torch.Tensor:  # [B, C, T]
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for block in self.convnext:
            x = block(x)
        return self.final_layer_norm(x.transpose(1, 2))  # [B, T, C]


class _ISTFTHead(nn.Module):
    """Official vocos.heads.ISTFTHead with padding="same"."""

    def __init__(self, dim: int, n_fft: int, hop_length: int):
        super().__init__()
        self.out = nn.Linear(dim, n_fft + 2)
        self.n_fft = n_fft
        self.hop = hop_length
        self.register_buffer("window", torch.hann_window(n_fft))

    def forward(self, x: torch.Tensor) -> torch.Tensor:  # [B, T, C]
        x = self.out(x).transpose(1, 2)  # [B, n_fft+2, T]
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag)
        mag = torch.clip(mag, max=1e2)
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))

        # official "same" ISTFT: irfft each frame, window, fold, divide by
        # the window-square envelope, trim (n_fft - hop)//2 per side
        ifft = torch.fft.irfft(spec, self.n_fft, dim=1, norm="backward")
        ifft = ifft * self.window[None, :, None]
        n_frames = ifft.shape[-1]
        output_size = (n_frames - 1) * self.hop + self.n_fft
        y = torch.nn.functional.fold(
            ifft, output_size=(1, output_size),
            kernel_size=(1, self.n_fft), stride=(1, self.hop),
        )[:, 0, 0, :]
        win_sq = self.window.square().expand(1, n_frames, -1).transpose(1, 2)
        env = torch.nn.functional.fold(
            win_sq, output_size=(1, output_size),
            kernel_size=(1, self.n_fft), stride=(1, self.hop),
        )[0, 0, 0, :]
        pad = (self.n_fft - self.hop) // 2
        y = y[:, pad:-pad]
        env = env[pad:-pad]
        assert (env > 1e-11).all()
        return y / env


class _TorchVocos(nn.Module):
    def __init__(self, n_mels=100, dim=512, inter=1536, n_layers=8,
                 n_fft=1024, hop=256):
        super().__init__()
        self.backbone = _Backbone(n_mels, dim, inter, n_layers)
        self.head = _ISTFTHead(dim, n_fft, hop)

    def forward(self, mel: torch.Tensor) -> torch.Tensor:
        return self.head(self.backbone(mel))


@pytest.mark.parametrize("n_layers,dim,inter", [(2, 64, 96), (8, 512, 1536)])
def test_official_vocos_weight_port(n_layers, dim, inter):
    torch.manual_seed(0)
    n_mels, n_fft, hop, t = 100, 1024, 256, 37
    model = _TorchVocos(n_mels, dim, inter, n_layers, n_fft, hop).eval()
    # perturb weights away from their init so the test is not trivially
    # symmetric; keep magnitudes moderate to avoid the mag clip saturating
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))

    mel = torch.randn(2, n_mels, t) * 0.5
    with torch.no_grad():
        wav_torch = model(mel).numpy()

    state_dict = {k: v for k, v in model.state_dict().items()
                  if not k.endswith("window")}
    params = convert_vocos_state_dict(state_dict, n_layers=n_layers)
    decoder = VocosDecoder(
        n_mels=n_mels, dim=dim, n_layers=n_layers, intermediate_dim=inter,
        n_fft=n_fft, hop_length=hop, head_mode="mag_phase", layer_scale=True,
    )
    wav_jax = np.asarray(decoder.apply({"params": params}, jnp.asarray(mel.numpy())))

    assert wav_jax.shape == wav_torch.shape == (2, t * hop)
    scale = np.abs(wav_torch).max() + 1e-12
    max_err = np.abs(wav_jax - wav_torch).max()
    assert max_err < 1e-4 * max(scale, 1.0), (
        f"waveform mismatch: max abs err {max_err:.3e} (signal peak {scale:.3e})"
    )


def test_golden_fixture_roundtrip():
    """Committed golden: official-layout state_dict + mel + torch waveform
    (scripts/make_vocos_golden.py). Pins the converter and the mag/phase
    ISTFT numerics against drift in torch, jax, OR the converter itself —
    the assertion target never moves."""
    import jax.numpy as jnp

    fixture = (Path(__file__).parent / "fixtures" / "vocos_golden.npz")
    data = np.load(fixture)
    n_layers, dim, inter, n_mels, n_fft, hop = (int(x) for x in data["__meta__"])
    sd = {k[3:]: torch.from_numpy(data[k]) for k in data.files
          if k.startswith("sd:")}
    params = convert_vocos_state_dict(sd, n_layers=n_layers)
    decoder = VocosDecoder(
        n_mels=n_mels, dim=dim, n_layers=n_layers, intermediate_dim=inter,
        n_fft=n_fft, hop_length=hop, head_mode="mag_phase", layer_scale=True,
    )
    wav = np.asarray(decoder.apply({"params": params}, jnp.asarray(data["__mel__"])))
    ref = data["__wav__"]
    assert wav.shape == ref.shape
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(wav - ref).max() < 1e-4 * scale


def test_hub_id_routing_and_torch_load(tmp_path, monkeypatch):
    """load_vocoder("org/name") routes through the hub fetch and the torch
    converter path, inferring architecture dims from the tensors. Uses the
    committed golden state_dict saved as a .pt so the full
    hub-id → download → convert → decode chain is exercised offline."""
    import oron_tts_tpu.models.f5tts as f5tts_mod
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS, _looks_like_hub_id

    assert _looks_like_hub_id("charactr/vocos-mel-24khz")
    assert not _looks_like_hub_id("/abs/path")
    assert not _looks_like_hub_id("./rel/path")
    assert not _looks_like_hub_id("plainname")
    assert not _looks_like_hub_id("dir/weights.npz")
    assert not _looks_like_hub_id("a/b/c")

    data = np.load(Path(__file__).parent / "fixtures" / "vocos_golden.npz")
    sd = {k[3:]: torch.from_numpy(data[k]) for k in data.files
          if k.startswith("sd:")}
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(sd, ckpt)

    seen = []
    monkeypatch.setattr(
        f5tts_mod, "_fetch_vocos_from_hub",
        lambda repo_id: seen.append(repo_id) or ckpt,
    )
    cfg = {"sample_rate": 24000, "n_mels": 100,
           "model": {"vocab_size": 65, "dim": 32, "depth": 1, "heads": 2,
                     "ff_mult": 2, "text_dim": 16, "conv_layers": 1,
                     "p_dropout": 0.0}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.load_vocoder("charactr/vocos-mel-24khz")
    assert seen == ["charactr/vocos-mel-24khz"]
    module, variables = model._vocoder
    assert module.n_layers == 2 and module.dim == 64
    import jax.numpy as jnp

    wav = np.asarray(module.apply(variables, jnp.asarray(data["__mel__"])))
    ref = data["__wav__"]
    assert np.abs(wav - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)
