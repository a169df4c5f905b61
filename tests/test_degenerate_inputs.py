"""Degenerate-input guards from the round-5 advisor review: shapes the
shipped test corpus happens to avoid but a regenerated corpus can produce.

- `neardup_cluster_modularity` on a corpus with ZERO near-dup pairs must
  return an explicit zero-edge row (NULL Q), not ZeroDivisionError on the
  driver (`operators/dedup.py`).
- `kaplan_meier_view_to_purchase` when a duration bucket exhausts the risk
  set (d == n_at_risk, e.g. the max-duration subject converts) must emit
  survival 0.0 from that bucket on, not a silently-skipped NULL ln(0) term
  (`operators/events.py`); the DuckDB oracle must not crash on ln(0) either.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def unique_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nodups")
    # pairwise-disjoint token sets -> Jaccard 0 for every pair
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [f"tok{i}a tok{i}b tok{i}c" for i in range(8)],
            "lang": ["en"] * 4 + ["de"] * 4,
            "source": ["s0"] * 8,
            "n_chars": [17] * 8,
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_modularity_empty_graph_returns_sentinel_row(spark, unique_docs_dir):
    from data_to_parquet_spark.operators.dedup import (
        neardup_cluster_modularity,
    )

    rows = neardup_cluster_modularity(spark, unique_docs_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] == 0
    assert r["n_intra_edges"] == 0
    assert r["n_clusters_with_edges"] == 0
    assert r["modularity"] is None


@pytest.fixture(scope="module")
def exhausting_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kmzero")
    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, uid, kind, days):
        return {
            "event_id": i,
            "ts": t0 + datetime.timedelta(days=days),
            "user_id": uid,
            "event_type": kind,
            "value": 1.0,
            "props": "{}",
        }

    events = [
        # user 1: converts at day 1 (d=1 of n=3 at risk)
        ev(0, 1, "view", 0),
        ev(1, 1, "purchase", 1),
        # user 2: censored at day 2 (c=1 of n=2 at risk)
        ev(2, 2, "view", 0),
        ev(3, 2, "click", 2),
        # user 3: converts at day 5 — the LAST subject at risk converts,
        # so d == n_at_risk == 1 and the hazard factor is ln(0)
        ev(4, 3, "view", 0),
        ev(5, 3, "purchase", 5),
    ]
    pd.DataFrame(events).to_parquet(root / "events.parquet")
    return str(root)


def test_km_exhausted_risk_set_survival_zero(spark, exhausting_events_dir):
    from data_to_parquet_spark.operators.events import (
        kaplan_meier_view_to_purchase,
    )
    import __spark_entry__ as entry_mod

    got = {
        r["duration_days"]: r
        for r in kaplan_meier_view_to_purchase(
            spark, exhausting_events_dir
        ).collect()
    }
    assert got[1]["survival"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert got[5]["n_at_risk"] == 1 and got[5]["d_events"] == 1
    assert got[5]["survival"] == 0.0

    # the oracle must agree AND not raise DuckDB's ln(0) Out of Range
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{exhausting_events_dir}/events.parquet'"
    )
    sql = entry_mod.oracle_sql()["kaplan_meier_view_to_purchase"]
    oracle = {
        row[0]: row
        for row in con.execute(sql).fetchall()
    }
    con.close()
    assert oracle[5][4] == 0.0
    assert oracle[1][4] == pytest.approx(got[1]["survival"], abs=1e-9)


@pytest.fixture(scope="module")
def duplicate_init_embeddings_dir(tmp_path_factory):
    """vec 0 and vec 1 are IDENTICAL, so the k=8 lowest-id init creates two
    equal centroids. Iteration 1 assigns both duplicates (tie -> lowest
    index) AND point 8 to cluster 0, leaving cluster 1 EMPTY — the
    keep-previous-centroid branch runs on BOTH engines. Because cluster 1
    kept [0,0,0,1] exactly, iteration 2 pulls the two duplicates back (d2
    0 beats the dragged cluster-0 mean); had either engine zeroed or
    dropped the empty centroid, the final partition would differ."""
    root = tmp_path_factory.mktemp("kmempty")
    base = [
        [0.0, 0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, 1.0],  # identical to vec 0
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, 1.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.25, 0.0, 0.0, 0.75],
        [0.8, 0.1, 0.0, 0.0],
    ]
    emb = pd.DataFrame(
        {
            "vec_id": range(len(base)),
            "embedding": base,
            "label": [0] * len(base),
        }
    )
    emb.to_parquet(root / "embeddings.parquet")
    return str(root)


def test_kmeans_empty_cluster_keeps_centroid_and_oracle_agrees(
    spark, duplicate_init_embeddings_dir
):
    from data_to_parquet_spark.operators.similarity import (
        kmeans_embedding_clusters,
    )
    import __spark_entry__ as entry_mod

    got = {
        r["cluster"]: r
        for r in kmeans_embedding_clusters(
            spark, duplicate_init_embeddings_dir
        ).collect()
    }
    # cluster 1 emptied in iteration 1 and kept its exact init centroid,
    # so it recaptured both duplicate points; the kept [0,0,0,1] is also
    # their mean, hence inertia 0 and norm 1
    assert got[1]["n_members"] == 2
    assert got[1]["inertia"] == 0.0
    assert got[1]["centroid_norm"] == pytest.approx(1.0, abs=1e-9)
    assert sum(r["n_members"] for r in got.values()) == 10

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{duplicate_init_embeddings_dir}/embeddings.parquet'"
    )
    sql = entry_mod.oracle_sql()["kmeans_embedding_clusters"]
    oracle = {row[0]: row for row in con.execute(sql).fetchall()}
    con.close()
    assert sorted(oracle) == sorted(got)
    for c, r in got.items():
        o = oracle[c]
        assert o[1] == r["n_members"], (c, o, tuple(r))
        assert o[2] == pytest.approx(r["inertia"], abs=1e-9)
        assert o[3] == pytest.approx(r["centroid_norm"], abs=1e-9)


@pytest.fixture(scope="module")
def nonpositive_group_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gmzero")
    t0 = datetime.datetime(2024, 1, 1)
    events = pd.DataFrame(
        {
            "event_id": range(4),
            "ts": [t0 + datetime.timedelta(hours=i) for i in range(4)],
            "user_id": [1, 1, 2, 2],
            "event_type": ["zeroed", "zeroed", "view", "view"],
            # one group with NO positive values, one normal group
            "value": [0.0, 0.0, 2.0, 8.0],
            "props": ["{}"] * 4,
        }
    )
    events.to_parquet(root / "events.parquet")
    return str(root)


def test_geometric_mean_all_nonpositive_group_is_null(
    spark, nonpositive_group_events_dir
):
    """A group whose every value is <= 0 must yield NULL from BOTH the
    pandas-UDAF leg and the algebraic leg (np.log([]).mean() would yield
    NaN + a RuntimeWarning and desync the legs), and the oracle must not
    raise DuckDB's eager ln(0) Out of Range (the sf0.1 incident class)."""
    import __spark_entry__ as entry_mod
    from data_to_parquet_spark.operators.events import udaf_geometric_mean

    got = {
        r["event_type"]: r
        for r in udaf_geometric_mean(
            spark, nonpositive_group_events_dir
        ).collect()
    }
    assert got["zeroed"]["geo_mean_udaf"] is None
    assert got["zeroed"]["geo_mean_algebraic"] is None
    assert got["zeroed"]["n_events"] == 2
    assert got["view"]["geo_mean_udaf"] == pytest.approx(4.0, abs=1e-6)
    assert got["view"]["geo_mean_algebraic"] == pytest.approx(4.0, abs=1e-6)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{nonpositive_group_events_dir}/events.parquet'"
    )
    sql = entry_mod.oracle_sql()["udaf_geometric_mean"]
    oracle = {row[0]: row for row in con.execute(sql).fetchall()}
    con.close()
    assert oracle["zeroed"][1] is None and oracle["zeroed"][2] is None
    assert oracle["view"][1] == pytest.approx(4.0, abs=1e-6)
