"""Pins for mannwhitney_source_drift (operators/pipeline.py): the
histogram-ranked Mann-Whitney U drift test.

- A seeded random corpus replayed by a pure-Python reference (average
  ranks, tie-corrected normal approximation) — every output column
  compared exactly; the z chain is IEEE-deterministic on int64 operands
  so exact equality is meaningful.
- An all-tied corpus (zero variance) short-circuits to z = 0.
- A maximally separated corpus drives U to its extreme and flags both
  sources at the 5% level.
"""

from __future__ import annotations

import collections
import math

import pandas as pd

from data_to_parquet_spark.operators.pipeline import (
    mannwhitney_source_drift,
)


def _write_docs(root, rows):
    # rows: list of (source, n_tokens) — text synthesized to that length
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [" ".join(f"w{i}" for i in range(k)) for _, k in rows],
            "lang": ["en"] * len(rows),
            "source": [s for s, _ in rows],
            "n_chars": [1] * len(rows),
        }
    ).to_parquet(root / "documents.parquet")
    return str(root)


def _reference(rows):
    vals = [v for _, v in rows]
    n = len(vals)
    hist = collections.Counter(vals)
    cum, r2 = 0, {}
    for v in sorted(hist):
        r2[v] = 2 * cum + hist[v] + 1
        cum += hist[v]
    tie3 = sum(c**3 - c for c in hist.values())
    out = {}
    for s in {s for s, _ in rows}:
        mine = [v for src, v in rows if src == s]
        n1 = len(mine)
        rank_sum_x2 = sum(r2[v] for v in mine)
        u = (rank_sum_x2 - n1 * (n1 + 1)) / 2
        var = n1 * (n - n1) / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
        if n > 1 and var > 0:
            z = (rank_sum_x2 - n1 * (n1 + 1) - n1 * (n - n1)) / (
                2.0 * math.sqrt(var)
            )
        else:
            z = 0.0
        out[s] = (n1, rank_sum_x2, u, z, int(abs(z) > 1.959964))
    return out


def test_matches_python_reference_on_random_corpus(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(2026)
    rows = [
        (f"s{rng.integers(0, 4)}", int(rng.integers(3, 40)))
        for _ in range(200)
    ]
    sf_dir = _write_docs(tmp_path, rows)
    want = _reference(rows)
    got = {
        r["source"]: (
            r["n_docs"],
            r["rank_sum_x2"],
            r["u_stat"],
            r["z_value"],
            r["drifted_5pct"],
        )
        for r in mannwhitney_source_drift(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for s in want:
        assert got[s][:3] == want[s][:3], s
        assert got[s][3] == want[s][3], s  # exact: IEEE chain on ints
        assert got[s][4] == want[s][4], s


def test_all_tied_corpus_zero_variance_guard(spark, tmp_path):
    rows = [("sA", 5)] * 6 + [("sB", 5)] * 6  # every doc 5 tokens
    sf_dir = _write_docs(tmp_path, rows)
    for r in mannwhitney_source_drift(spark, sf_dir).collect():
        assert r["z_value"] == 0.0
        assert r["drifted_5pct"] == 0
        # rank sums still exact: everyone shares the average rank (n+1)/2
        assert r["rank_sum_x2"] == r["n_docs"] * (len(rows) + 1)


def test_separated_sources_hit_extreme_u_and_flag(spark, tmp_path):
    # sA strictly shorter than every sB doc: U(sA) = 0, U(sB) = n1*n2,
    # both flagged at the 5% level (n = 40 is ample for |z| > 1.96)
    rows = [("sA", k) for k in range(3, 23)] + [
        ("sB", k) for k in range(30, 50)
    ]
    sf_dir = _write_docs(tmp_path, rows)
    got = {
        r["source"]: r for r in mannwhitney_source_drift(spark, sf_dir).collect()
    }
    assert got["sA"]["u_stat"] == 0.0
    assert got["sB"]["u_stat"] == 20.0 * 20.0
    assert got["sA"]["z_value"] < -1.96 < 1.96 < got["sB"]["z_value"]
    assert got["sA"]["drifted_5pct"] == 1
    assert got["sB"]["drifted_5pct"] == 1
    # antisymmetry of the two-source case
    assert got["sA"]["z_value"] == -got["sB"]["z_value"]
