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
    updates = c.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", (F.col("c_acctbal") * 1.1).cast("decimal(18,2)").cast("double").alias("new_acctbal")
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
    base = c.select("c_custkey", "c_acctbal")
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
