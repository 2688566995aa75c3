"""Shim: the dataset-prep CLI lives in oron_tts_tpu.cli.prepare (``oron-prepare``)."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.cli.prepare import (  # noqa: E402,F401
    MIN_SAMPLES,
    create_metadata,
    main,
    process_dataset,
)

if __name__ == "__main__":
    main()
