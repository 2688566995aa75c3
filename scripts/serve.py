"""Shim: the serving entry point lives in oron_tts_tpu.cli.serve (packaged
as the ``oron-serve`` console script); this keeps the documented
``python scripts/serve.py`` invocation working from a checkout."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from oron_tts_tpu.cli.serve import main  # noqa: E402,F401

if __name__ == "__main__":
    main()
