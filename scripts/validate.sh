#!/usr/bin/env bash
# Release validation: the full gate a round should pass before handing off.
#  1. unit + e2e + property + fault-injection tests
#  2. driver rehearsal (entry + every query vs its DuckDB oracle at sf0.01)
#  3. bench smoke at sf0.01
# Usage: scripts/validate.sh   (from the repo root; ~6 minutes)
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

echo "== 1/3 pytest (fast tier: the default gate) =="
python -m pytest tests/ -x -q -m "not slow"

echo "== 2/3 slow tier (driver contract vs DuckDB oracles at sf0.01 + process fault injection) =="
python -m pytest tests/ -q -m "slow"

echo "== 3/3 bench smoke (sf0.01) =="
GRAFT_SF_DIR=/root/testdata/sf0.01 RAY_GRAFT_CPUS=8 OTR_BENCH_REPS=1 python bench.py

echo "VALIDATION PASS"
