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

echo "== full parity @ sf0.1 (bench scale; ~25 min) =="
# Round 7 ran the WHOLE oracle suite at sf0.1 for the first time and
# caught two divergences invisible at sf<=0.01 (a DuckDB eager-ln(0)
# crash on a value that first appears at sf0.1, and a round()-tie ulp
# split) — so this stage now sweeps everything rather than only the
# Lloyd/ANN ulp families. Excluded: the oracles whose SQL replays an
# all-pairs token join (quadratic in DuckDB — sf0.1 is ~18M
# list_intersect pairs and does not terminate in useful time); the list
# is derived from the oracle text itself so it cannot rot as queries
# are added. Those queries' sf0.1 behavior is covered by the Spark-side
# scale probes (SCALING.md) and their driver checks at sf0.01.
DESELECT=$(python - <<'EOF'
import re
import __spark_entry__ as e
pat = re.compile(r"JOIN tok b|JOIN tok a|a\.doc_id < b\.doc_id|doc_a < |list_intersect")
heavy = sorted(n for n, sql in e.oracle_sql().items() if pat.search(sql))
print(" and ".join(f"not {n}" for n in heavy))
EOF
)
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_oracle_parity.py -q -k "$DESELECT"

echo "== quadratic-oracle parity @ 1500 docs (3x driver docs, 9x pairs; ~7 min) =="
# The pair-join oracles excluded above had only ever been value-checked
# at 500 documents (sf<=0.01). A truncated 1500-doc slice of the sf0.1
# corpus is the largest scale where DuckDB's all-pairs joins stay
# tractable — 9x the pair count of any driver check. Non-document tables
# are symlinked from sf0.1 (all 14 queries read documents only; the
# other views just need to resolve).
python - <<'EOF'
import os, shutil
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, dst = "/root/testdata/sf0.1", "/tmp/d2p_sf_mid"
shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
t = pq.read_table(f"{src}/documents.parquet")
cut = sorted(t.column("doc_id").to_pylist())[:1500][-1]
pq.write_table(
    t.filter(pc.less_equal(t.column("doc_id"), cut)),
    f"{dst}/documents.parquet",
)
for name in (
    "region nation customer supplier part orders lineitem events embeddings"
).split():
    os.symlink(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
EOF
SELECT=$(python - <<'EOF'
import re
import __spark_entry__ as e
pat = re.compile(r"JOIN tok b|JOIN tok a|a\.doc_id < b\.doc_id|doc_a < |list_intersect")
heavy = sorted(n for n, sql in e.oracle_sql().items() if pat.search(sql))
print(" or ".join(heavy))
EOF
)
SPARK_GRAFT_TEST_SF_DIR=/tmp/d2p_sf_mid \
  python -m pytest tests/test_oracle_parity.py -q -k "$SELECT"

echo "== regenerate all-time bench bands from committed history =="
# bench.py's _vs_alltime_band reads BANDS.json; regenerating first means
# this run flags against bands that include every committed record
# (r13 VERDICT items 1+7). Commit the regenerated file with the round.
python tools/bench_bands.py

echo "== settle-wait: let the gate's own load dissipate before timing =="
# The parity stages above run all cores for ~40 minutes; benching on
# their stale load produced a flag-churn record in BOTH r13 and r14
# (r14: 219 s / 16 flags immediately after the gate vs 157 s / 2 flags
# on the same code twenty minutes later). Wait for loadavg + steal to
# clear (up to 10 min, then proceed anyway — the record carries its
# brackets either way).
python tools/wait_for_idle.py

echo "== bench @ sf0.1 =="
python bench.py

echo "== adjudicate driver-flagged regressions (idle re-measure) =="
# bench.py's drift guard writes >1.5x flags into BENCH_FULL.json; on a
# loaded box those mix real regressions with co-tenant noise (r6/r7 both
# hand-adjudicated them). This standing stage re-measures every flag on
# the now-idle box and records the dated verdict in BENCH_FULL.json's
# regression_adjudication block, so the judge reads evidence instead of
# re-litigating (VERDICT r7 item 6).
python tools/adjudicate_regressions.py
