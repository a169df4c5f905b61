"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the single most expensive repeated cost is re-shuffling fact
tables on their join key for every query. Bucketing amortizes it: write once
hash-partitioned into N buckets on the key, then every equi-join/groupBy on
that key reads co-located buckets with NO exchange. These helpers wrap the
``bucketBy().sortBy().saveAsTable()`` path and assert the plan property the
whole design hinges on (no Exchange operator in a bucketed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_plan_has_no_exchange"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join_plan_has_no_exchange(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> tuple[bool, str]:
    """Join two same-bucketed tables on the bucket key and report whether the
    physical plan is shuffle-exchange-free (the point of bucketing).

    Broadcast is disabled for the check: on small tables the planner prefers
    a broadcast join (and rightly so); the property being asserted is the
    big-table regime, where both sides exceed the broadcast threshold and a
    non-bucketed join would shuffle both.
    """
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left_table).join(spark.table(right_table), key)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange" not in plan, plan
