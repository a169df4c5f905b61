"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
builder; ``oracle_sql()`` provides the DuckDB-equivalent SQL for each
SQL-expressible query (the others get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_to_parquet_spark.operators.cdc import CDC
from data_to_parquet_spark.operators.dedup import DEDUP
from data_to_parquet_spark.operators.events import EVT
from data_to_parquet_spark.operators.misc import MISC
from data_to_parquet_spark.operators.multimodal import MM
from data_to_parquet_spark.operators.pipeline import PIPE
from data_to_parquet_spark.operators.relational import REL
from data_to_parquet_spark.operators.similarity import SIM
from data_to_parquet_spark.operators.text import TXT
from data_to_parquet_spark.operators.tpch_extra import TPCH_X
from data_to_parquet_spark.streaming.windows import STREAMING

_REGISTRY = REL.merge(EVT, TXT, DEDUP, SIM, MM, MISC, STREAMING, CDC, TPCH_X, PIPE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_to_parquet_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _REGISTRY.queries()


def oracle_sql() -> dict[str, str]:
    return _REGISTRY.oracles()
