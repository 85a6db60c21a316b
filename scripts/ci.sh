#!/bin/bash
# One-command CI gate (round-3 VERDICT item 8): quick tier + slow tier
# on the 8-virtual-device CPU mesh; --full adds the xslow tail
# (multi-minute e2e/CV/parity tests). The interpret-mode kernel parity
# tests are part of the quick tier; the real-TPU hardware gate stays
# manual (scripts/tpu_kernel_check.py --check) because CI machines have
# no chip.
#
# Timed round 4 (idle CPU): quick 15.0 min, slow-not-xslow 5.1 min,
# xslow ~25 min; 'scripts/ci.sh' green end-to-end in 20.6 min.
#
# usage: scripts/ci.sh [--full] [extra pytest args...]
set -e
cd "$(dirname "$0")/.."
FULL=0
if [ "$1" = "--full" ]; then FULL=1; shift; fi
echo "== quick tier =="
time python -m pytest tests/ -q "$@"
echo "== slow tier (without xslow tail) =="
time python -m pytest tests/ -q -m "slow and not xslow" "$@"
if [ "$FULL" = 1 ]; then
  echo "== xslow tail =="
  time python -m pytest tests/ -q -m xslow "$@"
fi
echo "CI green"
