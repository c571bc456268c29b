#!/usr/bin/env bash
# First-time setup (tooling parity with the reference's firstTimeSetup.sh):
# create a venv, install the package + extras, build the native loader.
set -euo pipefail

python3 -m venv .venv
source .venv/bin/activate
pip install --upgrade pip
pip install -e ".[data,observability,test]"
make -C native || echo "native loader build skipped (toolchain/libs missing)"
echo "done — activate with: source .venv/bin/activate"
