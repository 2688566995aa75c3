"""Shim: the training CLI lives in oron_tts_tpu.cli.train (``oron-train``)."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.cli.train import build_dataset, main  # noqa: E402,F401

if __name__ == "__main__":
    main()
