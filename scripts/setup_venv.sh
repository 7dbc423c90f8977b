#!/usr/bin/env bash
# Create a development virtualenv with the optional audio/UI extras.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m venv .venv
. .venv/bin/activate
pip install -U pip
pip install -e ".[audio,ui]" pytest
echo "venv ready: source .venv/bin/activate"
