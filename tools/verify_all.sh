#!/usr/bin/env bash
# One-command verification: tests + DuckDB oracles + bench smoke.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== DuckDB oracles (sf0.01) =="
python tools/check_oracle.py /root/testdata/sf0.01
echo "== bench (driver contract) =="
python bench.py
