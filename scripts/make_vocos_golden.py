#!/usr/bin/env python
"""Regenerate the committed Vocos-converter golden fixture.

Builds the from-scratch torch replica of the official
charactr/vocos-mel-24khz architecture (tests/test_vocos_official_parity.py),
seeds it deterministically, and stores:

- the official-layout state_dict (float32 arrays, official key names)
- the input mel
- the torch output waveform

into tests/fixtures/vocos_golden.npz. The paired test
(test_vocos_official_parity.py::test_golden_fixture_roundtrip) replays the
state_dict through convert_vocos_state_dict + the JAX VocosDecoder and
asserts the stored waveform — pinning the converter against BOTH torch
drift and converter drift without rebuilding the replica at test time.

Small dims keep the fixture ~300 KB; official dims (8×512×1536) are
covered live by test_official_vocos_weight_port.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

N_LAYERS, DIM, INTER = 2, 64, 96
N_MELS, N_FFT, HOP, T = 100, 1024, 256, 19
SEED = 1234


def main() -> None:
    import torch

    sys.path.insert(0, str(REPO_ROOT / "tests"))
    from test_vocos_official_parity import _TorchVocos

    torch.manual_seed(SEED)
    model = _TorchVocos(N_MELS, DIM, INTER, N_LAYERS, N_FFT, HOP).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))
    mel = torch.randn(1, N_MELS, T) * 0.5
    with torch.no_grad():
        wav = model(mel).numpy()

    out = {"__mel__": mel.numpy(), "__wav__": wav,
           "__meta__": np.asarray([N_LAYERS, DIM, INTER, N_MELS, N_FFT, HOP])}
    for k, v in model.state_dict().items():
        if k.endswith("window"):
            continue
        out[f"sd:{k}"] = v.numpy().astype(np.float32)
    dest = REPO_ROOT / "tests" / "fixtures" / "vocos_golden.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1e3:.0f} KB, "
          f"wav shape {wav.shape})")


if __name__ == "__main__":
    main()
