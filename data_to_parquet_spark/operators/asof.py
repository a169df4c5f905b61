"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the preferred path
per the build mandate): union the two sides with a tag, sort within one
window pass, and carry the most recent right-side row forward with
``last(..., ignorenulls=True)``. This is the scalable single-shuffle as-of:

* one shuffle on the join key (both sides hash-partitioned together);
* per-key state is one row (the last seen right-side payload);
* no range-explosion, no per-event subquery, no skew beyond the key's own.

Contrast with the naive ``join + filter + row_number`` (quadratic per key).
DuckDB's native ``ASOF JOIN`` / ``QUALIFY row_number`` is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` sharing the join key; NULL payload if none.

    ``tie_break``: right-side column ordering rows with equal ``right_time``
    (the greatest wins), making the match deterministic.
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("__tb"),
        payload_struct.alias("__payload"),
    )
    lcols = left.columns
    # the left rows' __tb is never compared between left rows (ordering ties
    # only matter among right rows), so NULL typed like the right side keeps
    # the union well-typed for any tie_break column type
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols],
    )
    # Right rows sort before left rows at equal timestamps (desc on the tag)
    # so `right_time == left_time` matches, i.e. `<=` semantics.
    w = (
        W.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__is_right").desc(), F.col("__tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l.unionByName(r.select(*l.columns[:5], *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols]))
    carried = merged.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__is_right") == 0).select(
        *lcols,
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
