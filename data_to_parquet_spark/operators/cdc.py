"""CDC / SCD-2 merge emulation — MERGE INTO without a table format.

Spark without Delta/Iceberg has no MERGE INTO; the standard emulation is
anti-join + union + window versioning, which is exactly how an SCD-2
dimension update runs at scale: one shuffle on the business key, no
row-at-a-time upserts.

The "change batch" is derived deterministically from the data itself (the
top-spending customers get a new account balance), so the query is pure and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Registry, load_table

CDC = Registry()


@CDC.register(
    "scd2_customer_balance_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, CAST(CAST(c_acctbal * 1.1 AS DECIMAL(18,2)) AS DOUBLE) AS new_acctbal
      FROM customer WHERE c_acctbal > 9000
    ),
    current_rows AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal,
             CASE WHEN u.c_custkey IS NOT NULL THEN 0 ELSE 1 END AS is_current,
             1 AS version
      FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    ),
    new_rows AS (
      SELECT c.c_custkey, c.c_name, u.new_acctbal AS c_acctbal,
             1 AS is_current, 2 AS version
      FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey
    )
    SELECT * FROM current_rows UNION ALL SELECT * FROM new_rows
    """,
)
def scd2_customer_balance_merge(spark, sf_dir):
    """SCD-2 merge: close changed rows (is_current=0), append new versions.

    Scale: both legs are one equi-join against the (usually small,
    broadcastable) change batch; the union is metadata-only. With a table
    format this becomes MERGE INTO; the shuffle shape is identical.
    """
    c = load_table(spark, sf_dir, "customer")
    # the change batch is small by construction; checkpointed so the two
    # merge legs below don't each re-scan customer to rebuild it (4 -> 2
    # scans; the remaining two are the legs' distinct roles)
    updates = (
        c.filter(F.col("c_acctbal") > 9000)
        .select(
            "c_custkey",
            (F.col("c_acctbal") * 1.1)
            .cast("decimal(18,2)")
            .cast("double")
            .alias("new_acctbal"),
        )
        .localCheckpoint(eager=False)
    )
    closed = (
        c.join(updates, "c_custkey", "left")
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.when(F.col("new_acctbal").isNotNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("is_current"),
            F.lit(1).alias("version"),
        )
    )
    appended = c.join(updates, "c_custkey").select(
        "c_custkey",
        "c_name",
        F.col("new_acctbal").alias("c_acctbal"),
        F.lit(1).alias("is_current"),
        F.lit(2).alias("version"),
    )
    return closed.unionByName(appended)


@CDC.register(
    "snapshot_diff_customers",
    oracle="""
    WITH v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_acctbal
      FROM customer WHERE c_custkey % 11 = 0
    )
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN a.c_custkey IS NULL THEN 'added'
                WHEN b.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           a.c_acctbal AS old_acctbal,
           b.c_acctbal AS new_acctbal
    FROM customer a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
    WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
       OR a.c_acctbal <> b.c_acctbal
    """,
)
def snapshot_diff_customers(spark, sf_dir):
    """Snapshot diff — the table-format-free CDC primitive: given two
    versions of a table (v2 derived deterministically: every 13th key
    deleted, every 7th balance bumped, every 11th re-inserted under a new
    key), emit the row-level changeset (added / removed / changed with
    old+new values) via one full-outer join on the business key. This is
    the diff a downstream incremental consumer replays, and the inverse of
    the SCD-2 merge above.

    Scale: ONE shuffle per side on the key (sort-merge full outer; both
    sides SF-scaling so no broadcast), comparison is a narrow projection,
    and unchanged rows — the overwhelming majority at 100 TB — are
    filtered before anything materializes. With both snapshots bucketed on
    the key (plans/bucketing.py) the exchanges disappear entirely.
    """
    c = load_table(spark, sf_dir, "customer")
    # narrow 2-column projection, checkpointed: v2's two derivation
    # branches and the diff's left side otherwise scan the parquet thrice
    base = c.select("c_custkey", "c_acctbal").localCheckpoint(eager=False)
    v2 = (
        base.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(
            base.filter(F.col("c_custkey") % 11 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
            )
        )
    )
    a = base.select(
        F.col("c_custkey").alias("a_key"), F.col("c_acctbal").alias("old_acctbal")
    )
    b = v2.select(
        F.col("c_custkey").alias("b_key"), F.col("c_acctbal").alias("new_acctbal")
    )
    return (
        a.join(b, F.col("a_key") == F.col("b_key"), "full_outer")
        .filter(
            F.col("a_key").isNull()
            | F.col("b_key").isNull()
            | (F.col("old_acctbal") != F.col("new_acctbal"))
        )
        .select(
            F.coalesce(F.col("a_key"), F.col("b_key")).alias("c_custkey"),
            F.when(F.col("a_key").isNull(), "added")
            .when(F.col("b_key").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            "old_acctbal",
            "new_acctbal",
        )
    )


@CDC.register(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, 1 AS version, c_acctbal AS bal,
             DATE '1992-01-01' AS valid_from,
             DATE '1994-01-01' + INTERVAL (c_custkey % 1000) DAY AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 2, c_acctbal + 500.0,
             DATE '1994-01-01' + INTERVAL (c_custkey % 1000) DAY,
             DATE '2099-01-01'
      FROM customer
    )
    SELECT o_orderpriority, version,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN dim ON o_custkey = c_custkey
     AND CAST(o_orderdate AS DATE) >= CAST(valid_from AS DATE)
     AND CAST(o_orderdate AS DATE) < CAST(valid_to AS DATE)
    GROUP BY o_orderpriority, version
    """,
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (temporal validity) join: every order is matched to
    the dimension VERSION that was valid on its order date — the lookup
    every SCD-2 dimension exists to serve, and the temporal complement of
    ``asof_events_latest_order`` (as-of = latest ≤ t over events; this =
    membership in a [valid_from, valid_to) interval). The versioned dim
    is derived deterministically (each customer flips to version 2 on a
    per-key date), so both engines build identical history.

    Scale: an EQUI-join on the business key with the interval bounds as a
    residual predicate — per key only \\|versions\\| rows survive, so there
    is no range explosion and the join shuffles exactly like any
    fact⋈dim key join (broadcast when the dim fits, SMJ otherwise; AQE
    decides — the dim scales with SF, so no forced hint). The final
    aggregate is map-side combined over \\|priorities\\|×\\|versions\\| groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    flip = F.date_add(
        F.lit("1994-01-01").cast("date"), (F.col("c_custkey") % 1000).cast("int")
    )
    v1 = c.select(
        "c_custkey",
        F.lit(1).alias("version"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        flip.alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.lit(2).alias("version"),
        flip.alias("valid_from"),
        F.lit("2099-01-01").cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    od = F.col("o_orderdate").cast("date")
    return (
        o.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (od >= F.col("valid_from"))
            & (od < F.col("valid_to")),
        )
        .groupBy("o_orderpriority", "version")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
