"""Configuration loading with the reference's flat-YAML schema.

Drop-in compatible with configs/{local,runpod,colab}.yaml of the reference:
flat audio/training keys + a nested ``model:`` section. Defaults are
centralized here instead of scattered across call sites.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


def load_config(path: str | Path) -> dict[str, Any]:
    path = Path(path)
    text = path.read_text()
    if path.suffix == ".json":
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


@dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 65
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    ff_mult: int = 4
    text_dim: int = 512
    conv_layers: int = 4
    p_dropout: float = 0.1
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)
    # lax.scan over stacked DiT blocks: same numerics, ~depth× faster cold
    # compile; checkpoints stay in the unrolled block{i} layout on disk
    scan_blocks: bool = False

    @property
    def dim_head(self) -> int:
        return self.dim // self.heads


@dataclass(frozen=True)
class AudioConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 100


@dataclass(frozen=True)
class F5Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    gradient_checkpointing: bool = False
    raw: dict[str, Any] = field(default_factory=dict, hash=False, compare=False)

    @classmethod
    def from_dict(cls, cfg: dict[str, Any]) -> "F5Config":
        m = cfg.get("model", {}) or {}
        frac = m.get("frac_lengths_mask", [0.7, 1.0])
        model = ModelConfig(
            vocab_size=m.get("vocab_size", 65),
            dim=m.get("dim", 1024),
            depth=m.get("depth", 22),
            heads=m.get("heads", 16),
            ff_mult=m.get("ff_mult", 4),
            text_dim=m.get("text_dim", 512),
            conv_layers=m.get("conv_layers", 4),
            p_dropout=m.get("p_dropout", 0.1),
            audio_drop_prob=m.get("audio_drop_prob", 0.3),
            cond_drop_prob=m.get("cond_drop_prob", 0.2),
            frac_lengths_mask=(float(frac[0]), float(frac[1])),
            scan_blocks=m.get("scan_blocks", False),
        )
        audio = AudioConfig(
            sample_rate=cfg.get("sample_rate", 24000),
            n_fft=cfg.get("n_fft", 1024),
            hop_length=cfg.get("hop_length", 256),
            win_length=cfg.get("win_length", 1024),
            n_mels=cfg.get("n_mels", 100),
        )
        return cls(
            model=model,
            audio=audio,
            gradient_checkpointing=cfg.get("gradient_checkpointing", False),
            raw=dict(cfg),
        )

    @classmethod
    def from_file(cls, path: str | Path) -> "F5Config":
        return cls.from_dict(load_config(path))
