#!/usr/bin/env bash
# Fast CI gate: the `-m "not slow"` tier split into two processes.
#
# Process 1 runs the compile-heavy, torch-free kernel/pipeline/training
# files with the persistent XLA compile cache (tests/conftest.py enables
# it only in torch-free processes — see the stability note there);
# process 2 runs the torch-golden files, whose compiles are small.
# Warm wall time is minutes; a plain `pytest tests/ -m "not slow"` is
# equivalent but runs every compile cold (torch in-process disables the
# cache) at ~20-25 min on a 1-core host.
set -e
cd "$(dirname "$0")/.."

TORCH_FREE=$(grep -L "import torch" tests/test_*.py)
TORCH_FILES=$(grep -l "import torch" tests/test_*.py)

echo "== torch-free (cached) =="
python -m pytest $TORCH_FREE -q -m "not slow" "$@"
echo "== torch goldens (uncached) =="
python -m pytest $TORCH_FILES -q -m "not slow" "$@"
