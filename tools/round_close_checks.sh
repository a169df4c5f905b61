#!/usr/bin/env bash
# Round-close verification gate (VERDICT r5 item 3): the driver oracles at
# sf0.01 while the default local harness runs at sf0.001 — a 10x row-count
# gap where data-dependent thresholds and ties can flip (the NTZ class of
# "local green, driver red"). Run this before closing every round.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== full suite @ sf0.001 =="
python -m pytest tests/ -q

echo "== oracle parity @ sf0.01 (driver scale) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
  python -m pytest tests/test_oracle_parity.py -q

echo "== Lloyd/ANN-family parity @ sf0.1 (ulp-tolerance queries at bench scale) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_oracle_parity.py -q \
  -k "kmeans or ann_lsh or ann_ivf or semdedup or dbscan or pagerank or decode_manifest"

echo "== bench @ sf0.1 =="
python bench.py
