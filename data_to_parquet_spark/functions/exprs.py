"""Shared column-expression helpers used across operators.

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` only) so it
participates in whole-stage codegen; oracle parity notes are attached to each
helper because the driver's DuckDB comparison hashes exact values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "money",
    "dsum",
    "davg",
    "dot",
    "norm",
    "cosine",
    "tokens",
    "distinct_tokens",
    "exploded_rows",
    "exploded_rows_pos",
]

# -- exact-arithmetic aggregates ------------------------------------------
# Double-precision SUM is order-dependent, so a Spark sum and a DuckDB sum of
# the same doubles can differ in the last ulp and break value-hash comparison.
# Recipe used by every oracle-checked aggregate: compute the row-level
# expression in DOUBLE (deterministic per row), cast it to DECIMAL(18,s)
# (deterministic rounding of one double), SUM the decimals (exact, order-
# independent), cast the final total back to DOUBLE. The DuckDB oracles use
# the literal same shape: CAST(SUM(CAST(expr AS DECIMAL(18,s))) AS DOUBLE).


def money(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent exact sum of a money-like column, as DOUBLE."""
    return F.sum(money(col, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """avg = exact decimal sum / count, divided in DOUBLE (deterministic)."""
    return (
        F.sum(money(col, scale)).cast("double") / F.count(F.lit(1))
    ).alias(alias)


# -- embedding math --------------------------------------------------------
# Sequential left-fold so DuckDB's list_reduce over the same element order
# produces the bit-identical double (0.0 + p1 == p1 exactly, then the same
# chain of IEEE additions).


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_from(dotv: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot product and norms, NULL when either
    norm is zero. Spark 4's ANSI mode raises DIVIDE_BY_ZERO even for
    doubles, so an all-zero vector anywhere in a corpus would CRASH every
    similarity query; DuckDB's division quietly yields NULL, which then
    fails every >= threshold verify and ranks last — the F.when guard
    gives Spark the same semantics, so the oracles need no change."""
    den = na * nb
    return F.when(den > 0, dotv / den)


def cosine(a: Column, b: Column) -> Column:
    return cosine_from(dot(a, b), norm(a), norm(b))


# -- text tokenization -----------------------------------------------------
# One regex shared verbatim with the DuckDB oracles (string_split_regex):
# lowercase, split on runs of non-alphanumerics, drop empty fragments.

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


# -- deterministic cross-engine hash buckets ---------------------------------
# The first 8 md5 hex chars of the value's string form, as an integer,
# mod n — stable across runs AND engines (xxhash64 is Spark-only). Keep
# the Spark expression and the DuckDB fragment in lockstep here;
# quality_decile_schedule buckets with this pair (sequence_packing's
# shards and split_train_val_test's prefix rule predate it).


def md5_bucket(col: Column, n: int) -> Column:
    return F.pmod(
        F.conv(
            F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(n),
    )


def md5_bucket_sql(expr: str, n: int) -> str:
    """DuckDB twin of :func:`md5_bucket` (same hex slice, same modulus)."""
    return (
        f"CAST('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {n}"
    )


# -- fast explode of computed arrays ---------------------------------------


def exploded_rows(df, keep, arr: Column, alias: str):
    """Explode a COMPUTED array expression without paying the interpreted
    GenerateExec penalty.

    ``df.select(F.explode(expensive_expr))`` lets CollapseProject inline the
    array expression into the generator, where higher-order functions and
    lambdas evaluate OUTSIDE whole-stage codegen — measured 5× slower than
    this shape on the 5-gram shingle explode (4.0 s → 0.8 s at sf0.1).
    Here the array is evaluated once per input row in a codegen'd
    projection below the Generate; the generator's child is a trivial
    position ``sequence``; elements are fetched by a plain ``element_at``
    projection above it (Project cannot collapse through Generate).

    ``keep``: column names to carry through; ``arr``: the array expression;
    ``alias``: output column name for the exploded element. Null/empty
    arrays yield no rows, matching ``explode`` exactly (the greatest/slice
    guard makes the position list empty for size 0 and NULL — Spark's
    ``sequence(1, 0)`` is the DESCENDING [1, 0], not empty).
    """
    tmp = df.select(*keep, arr.alias("__x_arr"))
    pos = F.explode(
        F.expr(
            "slice(sequence(1, greatest(size(__x_arr), 1)),"
            " 1, greatest(size(__x_arr), 0))"
        )
    ).alias("__x_i")
    return tmp.select(*keep, "__x_arr", pos).select(
        *keep, F.element_at("__x_arr", F.col("__x_i")).alias(alias)
    )


def exploded_rows_pos(df, keep, arr: Column, pos_alias: str, alias: str):
    """``posexplode`` twin of :func:`exploded_rows`: same interpreted-
    GenerateExec avoidance, emitting the 0-based element position under
    ``pos_alias`` alongside the element."""
    tmp = df.select(*keep, arr.alias("__x_arr"))
    pos = F.explode(
        F.expr(
            "slice(sequence(1, greatest(size(__x_arr), 1)),"
            " 1, greatest(size(__x_arr), 0))"
        )
    ).alias("__x_i")
    return tmp.select(*keep, "__x_arr", pos).select(
        *keep,
        (F.col("__x_i") - F.lit(1)).alias(pos_alias),
        F.element_at("__x_arr", F.col("__x_i")).alias(alias),
    )
