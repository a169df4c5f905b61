"""data_to_parquet_spark — a PySpark-native analytics engine with the
capabilities of the reference Excel→Parquet converter, extended with a
relational query surface and LLM-data-pipeline operators.

Public API:

* :func:`convert` / :func:`convert_to_parquet` — reference-parity conversion.
* :func:`read_excel` — Excel workbooks → DataFrame (all-nullable-string).
* :func:`to_parquet` / :func:`to_single_parquet_file` — ZSTD Parquet sinks.
* :func:`get_spark` — tuned SparkSession factory.
* :mod:`.operators` — relational, dedup, similarity, text, as-of operators.
"""

from . import ops
from .api import convert, convert_many, convert_to_parquet
from .errors import DataToParquetError
from .session import get_spark
from .sinks.parquet import to_parquet, to_single_parquet_file
from .sources.excel import read_excel

__version__ = "0.1.0"

__all__ = [
    "convert",
    "convert_many",
    "ops",
    "convert_to_parquet",
    "read_excel",
    "to_parquet",
    "to_single_parquet_file",
    "get_spark",
    "DataToParquetError",
    "__version__",
]
