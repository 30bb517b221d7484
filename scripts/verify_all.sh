#!/usr/bin/env bash
# Full verification battery: unit/e2e tests, oracle gate, benchmark.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01) =="
python scripts/driver_sim.py

echo "== bench (sf0.1) =="
python bench.py
