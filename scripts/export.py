"""Export a native checkpoint to the reference's torch-compatible formats.

Closes the interop loop: models trained on TPU here can be loaded by the
PyTorch reference (scripts/infer.py there) or any F5-TTS-compatible stack.

    python scripts/export.py --checkpoint output/checkpoints \
        --output f5tts_export.safetensors [--no-ema] [--format pt]
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Export OronTTS-TPU checkpoint to torch-compatible format"
    )
    parser.add_argument("--checkpoint", type=str, required=True,
                        help=".npz checkpoint file or checkpoint directory")
    parser.add_argument("--output", type=str, required=True,
                        help="Output path (.safetensors or .pt)")
    parser.add_argument("--format", choices=["safetensors", "pt"], default=None,
                        help="Defaults from the output extension")
    parser.add_argument("--no-ema", action="store_true",
                        help="Export raw weights instead of EMA")
    args = parser.parse_args()

    from oron_tts_tpu.train.checkpoint import CheckpointManager, load_pytree_npz
    from oron_tts_tpu.utils.torch_compat import (
        export_f5tts_state_dict,
        save_safetensors,
    )

    path = Path(args.checkpoint)
    if path.is_dir():
        cm = CheckpointManager(str(path))
        found = cm.latest_checkpoint() or (
            cm.best_path() if cm.best_path().exists() else None
        )
        if found is None:
            raise SystemExit(f"error: no checkpoint found in {path}")
        path = found
    trees, meta = load_pytree_npz(path)
    params = (
        trees.get("params") if args.no_ema
        else (trees.get("ema") or trees.get("params"))
    )
    if params is None:
        raise SystemExit(f"error: no params in {path}")
    which = "raw" if args.no_ema or trees.get("ema") is None else "EMA"
    print(f"Exporting {which} weights from {path} (step {meta.get('step', '?')})")

    sd = export_f5tts_state_dict(params)
    out = Path(args.output)
    fmt = args.format or ("pt" if out.suffix == ".pt" else "safetensors")
    out.parent.mkdir(parents=True, exist_ok=True)
    if fmt == "safetensors":
        save_safetensors(sd, str(out))
    else:
        import torch

        torch.save(
            {"ema_state_dict" if which == "EMA" else "model_state_dict":
             {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
            out,
        )
    print(f"Saved {len(sd)} tensors to {out} ({fmt})")


if __name__ == "__main__":
    main()
