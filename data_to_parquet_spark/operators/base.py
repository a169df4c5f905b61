"""Operator registry plumbing.

Each operator module registers named queries: a Spark builder
``(spark, sf_dir) -> DataFrame`` plus an optional ANSI-SQL oracle string that
DuckDB can run over the same parquet tables. ``__spark_entry__.py`` aggregates
every module's registry into the driver contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "Registry", "load_table"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
        # default (PARQUET_TYPE_ILLEGAL). Read nanos as long and convert to
        # microsecond timestamps with integer division (ns are positive, so
        # `div 1000` truncates exactly like DuckDB's ns→us read does).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a rows-only check
    doc: str = ""


class Registry:
    def __init__(self) -> None:
        self._queries: dict[str, Query] = {}

    def register(self, name: str, oracle: str | None = None, doc: str = ""):
        def deco(fn):
            self._queries[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
            return fn

        return deco

    def queries(self) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
        return {q.name: q.fn for q in self._queries.values()}

    def oracles(self) -> dict[str, str]:
        return {
            q.name: q.oracle for q in self._queries.values() if q.oracle
        }

    def merge(self, *others: "Registry") -> "Registry":
        out = Registry()
        for reg in (self, *others):
            out._queries.update(reg._queries)
        return out
