#!/bin/bash
# One-command CI gate (round-3 VERDICT item 8): quick tier + slow tier
# on the 8-virtual-device CPU mesh. The interpret-mode kernel parity
# tests (tests/test_slab_kernel.py) are part of the quick tier; the
# real-TPU hardware gate stays manual (scripts/tpu_kernel_check.py
# --check) because CI machines have no chip.
#
# usage: scripts/ci.sh [extra pytest args...]
set -e
cd "$(dirname "$0")/.."
echo "== quick tier =="
time python -m pytest tests/ -q "$@"
echo "== slow tier =="
time python -m pytest tests/ -q -m slow "$@"
echo "CI green"
