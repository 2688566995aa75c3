#!/usr/bin/env bash
# One-shot TPU-VM setup for OronTTS-TPU (analogue of the reference's
# runpod_setup.sh): checks disk + python, creates a venv, installs the
# package with TPU jax, sets cache env defaults, runs the smoke test.
set -euo pipefail

MIN_DISK_GB=70
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"

avail_gb=$(df -BG --output=avail "$REPO_DIR" | tail -1 | tr -dc '0-9')
if [[ "${avail_gb:-0}" -lt "$MIN_DISK_GB" && -z "${ORON_ALLOW_SMALL_DISK:-}" ]]; then
    echo "ERROR: ${avail_gb}GB free < ${MIN_DISK_GB}GB required" \
         "(set ORON_ALLOW_SMALL_DISK=1 to override)" >&2
    exit 1
fi

if ! python3 -c 'import sys; sys.exit(sys.version_info < (3, 11))'; then
    echo "ERROR: Python >= 3.11 required" >&2
    exit 1
fi

cd "$REPO_DIR"
if [[ ! -d .venv ]]; then
    python3 -m venv --system-site-packages .venv
fi
# shellcheck disable=SC1091
source .venv/bin/activate

python -m pip install -q -U pip
# TPU jax wheel (skip if jax is already importable with a TPU backend)
if ! python -c 'import jax' 2>/dev/null; then
    pip install -q "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
fi
pip install -q -e .

# cache defaults persisted into .env
if [[ ! -f .env ]]; then
    cat > .env <<ENV
HF_HOME=$REPO_DIR/.cache/huggingface
JAX_COMPILATION_CACHE_DIR=$REPO_DIR/.cache/jax
ENV
fi

echo "Running smoke test..."
python scripts/test_pipeline.py
echo "Setup complete."
