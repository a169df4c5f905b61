"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every default here is chosen to also be
the right default on a large cluster: AQE on (runtime partition coalescing +
skew-join splitting), UTC session timezone (oracle comparability), Arrow
enabled for the Pandas-UDF paths, and shuffle partitions sized to cores rather
than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(app_name: str = "data_to_parquet_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER"):  # standalone/local invocation
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    return builder.getOrCreate()
