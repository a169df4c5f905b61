"""SQL surface: register the engine's tables as temp views so every operator
is reachable from ``spark.sql`` as well as the DataFrame API (Catalyst
produces the same plans either way).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.base import load_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = ["register_tables", "TABLES"]


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per corpus table; returns names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
