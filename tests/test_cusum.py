"""Independent check of ``cusum_changepoint_daily``: both engines share the
prefix-sum identity, so a parity match alone can't catch an identity error.
This recomputes the textbook sequential fold S_t = max(0, S_{t-1} + y_t)
directly from the parquet (duckdb read, pure-Python fold) and compares."""

from __future__ import annotations

from collections import defaultdict

import duckdb

import __spark_entry__ as entry_mod


def test_cusum_matches_sequential_fold(spark, sf_dir):
    out = {
        r["o_orderpriority"]: r
        for r in entry_mod.queries()["cusum_changepoint_daily"](
            spark, sf_dir
        ).collect()
    }

    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d, COUNT(*)
        FROM '{sf_dir}/orders.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for prio, _, n in daily:
        series[prio].append(n)

    assert set(out) == set(series)
    for prio, ns in series.items():
        d_days = len(ns)
        total = sum(ns)
        s = 0
        max_s = 0
        for n in ns:  # scaled integer fold: y = n*D - T - k*D
            s = max(s + (n * d_days - total - 5 * d_days), 0)
            max_s = max(max_s, s)
        r = out[prio]
        assert r["n_days"] == d_days
        assert abs(r["final_s"] - round(s / d_days, 9)) < 1e-9, prio
        assert abs(r["max_s"] - round(max_s / d_days, 9)) < 1e-9, prio
        assert r["drift_alarm"] == (max_s / d_days > 50.0)
