#!/usr/bin/env bash
# Full local validation: unit/property/DAG tests, DuckDB-oracle correctness
# at two scale factors, physical-plan audit, scaling probe, and the bench.
# Artifacts refreshed: PLANS.md, SCALE.md; bench prints its one JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle correctness sf0.01 =="
python tools/check_correctness.py /root/testdata/sf0.01

echo "== oracle correctness sf0.1 =="
python tools/check_correctness.py /root/testdata/sf0.1

echo "== physical-plan audit =="
python tools/explain_audit.py

echo "== scaling probe =="
python tools/scale_probe.py

echo "== bench =="
python bench.py
