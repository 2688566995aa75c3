"""Base-config sampler parity vs the torch reference (VERDICT r1 #4).

Runs the SAME random Base-scale weights (torch seed-7 init, converted via
convert_dit_state_dict — the path official F5-TTS checkpoints would ride,
/root/reference/src/utils/checkpoint.py:153-205) through the full 32-step
CFG Euler sampler at realistic shapes (T=1600, CFG 2.0, sway -1.0) in both
frameworks with identical initial noise, and reports elementwise mel MAE.

One-off CPU script (~20-40 min); results are recorded in PARITY.md.

    JAX_PLATFORMS=cpu python scripts/parity_base.py [--dim 1024 --depth 22
        --t-total 1600 --steps 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--text-dim", type=int, default=512)
    ap.add_argument("--t-total", type=int, default=1600)
    ap.add_argument("--t-ref", type=int, default=200)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--cfg-strength", type=float, default=2.0)
    ap.add_argument("--sway", type=float, default=-1.0)
    args = ap.parse_args()

    import os

    from oron_tts_tpu.utils.env import pin_platform

    pin_platform(os.environ.get("JAX_PLATFORMS") or "cpu")

    import numpy as np
    import torch

    from conftest import add_reference_to_path

    add_reference_to_path()
    from src.models.dit import DiT as TorchDiT
    from src.models.flow import CFM as TorchCFM

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT as JaxDiT
    from oron_tts_tpu.utils.torch_compat import convert_dit_state_dict

    cfg = dict(
        dim=args.dim, depth=args.depth, heads=args.heads, dim_head=64,
        ff_mult=4, dropout=0.0, mel_dim=100, vocab_size=65,
        text_dim=args.text_dim, conv_layers=4,
    )
    n_mels = cfg["mel_dim"]
    print(f"# config: {cfg}", file=sys.stderr)

    torch.manual_seed(7)
    t_backbone = TorchDiT(**cfg)
    with torch.no_grad():
        # zero-init proj_out/AdaLN makes the ODE trivial; randomize so the
        # trajectory exercises every block like trained weights would
        t_backbone.proj_out.weight.normal_(0, 0.02)
        t_backbone.proj_out.bias.normal_(0, 0.02)
    n_params = sum(p.numel() for p in t_backbone.parameters())
    print(f"# params: {n_params/1e6:.1f}M", file=sys.stderr)
    t_cfm = TorchCFM(t_backbone, n_mels=n_mels).eval()

    params = convert_dit_state_dict(
        t_backbone.state_dict(), depth=cfg["depth"],
        conv_layers=cfg["conv_layers"],
    )
    j_cfm = CFM(JaxDiT(**cfg), CFMConfig(n_mels=n_mels))

    B, t_ref, t_total, seed = 1, args.t_ref, args.t_total, 123
    rng = np.random.default_rng(0)
    ref_mel = rng.standard_normal((B, t_ref, n_mels)).astype(np.float32)
    text = rng.integers(0, 65, size=(B, t_total)).astype(np.int64)
    durations = [t_total]
    lens = np.array([t_ref], dtype=np.int64)

    t0 = time.monotonic()
    with torch.inference_mode():
        t_out, _ = t_cfm.sample(
            cond=torch.from_numpy(ref_mel),
            text_ids=torch.from_numpy(text),
            duration=torch.tensor(durations),
            lens=torch.from_numpy(lens),
            steps=args.steps,
            cfg_strength=args.cfg_strength,
            sway_sampling_coef=args.sway,
            seed=seed,
        )
    t_torch = time.monotonic() - t0
    print(f"# torch sampler: {t_torch:.1f}s", file=sys.stderr)

    # replicate flow.py:269-283 per-sample generator draws
    g = torch.Generator().manual_seed(seed)
    noise = torch.zeros(B, t_total, n_mels)
    for i, d in enumerate(durations):
        noise[i, :d] = torch.randn(d, n_mels, generator=g)

    cond_padded = np.zeros((B, t_total, n_mels), dtype=np.float32)
    cond_padded[:, :t_ref] = ref_mel

    t0 = time.monotonic()
    j_out, _ = j_cfm.sample(
        {"params": params},
        cond=cond_padded,
        text_ids=text,
        duration=np.array(durations),
        lens=lens,
        steps=args.steps,
        cfg_strength=args.cfg_strength,
        sway_sampling_coef=args.sway,
        noise=noise.numpy(),
    )
    j_out = np.asarray(j_out)
    t_jax = time.monotonic() - t0
    print(f"# jax sampler: {t_jax:.1f}s", file=sys.stderr)

    t_np = t_out.numpy()
    mae = float(np.abs(j_out - t_np).mean())
    max_err = float(np.abs(j_out - t_np).max())
    scale = float(np.abs(t_np).mean())
    print(json.dumps({
        "metric": "base_sampler_mel_mae",
        "dim": args.dim, "depth": args.depth, "t_total": t_total,
        "steps": args.steps, "cfg_strength": args.cfg_strength,
        "params_m": round(n_params / 1e6, 1),
        "mae": mae, "max_err": max_err, "ref_mean_abs": scale,
        "pass": mae < 1e-2,
    }))


if __name__ == "__main__":
    main()
