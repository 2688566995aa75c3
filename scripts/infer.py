"""Shim: the inference CLI lives in oron_tts_tpu.cli.infer (``oron-infer``)."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.cli.infer import load_model, main  # noqa: E402,F401

if __name__ == "__main__":
    main()
