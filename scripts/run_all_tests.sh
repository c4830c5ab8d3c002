#!/usr/bin/env bash
# Full test suite (CPU, 8 virtual devices via conftest.py). Takes ~15-20 min on the
# single-core host. Prints the pass count at the end for PROGRESS records.
set -uo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --durations=15 "$@"
