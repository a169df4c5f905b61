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
