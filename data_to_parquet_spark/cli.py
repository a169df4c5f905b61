"""CLI entry point — flag-for-flag parity with the reference binary
(``src/main.rs:7-33``): ``-i/--input``, ``-o/--output``, ``--sheet-name``,
``--sheet-index``, ``--skip-rows`` (default 0), ``--batch-size`` (default 5000).
"""

from __future__ import annotations

import argparse
import sys

from .api import convert
from .errors import DataToParquetError


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="data-to-parquet-spark",
        description="Convert Excel (.xlsx/.xlsb) to Parquet on Spark",
    )
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--sheet-name", default=None)
    p.add_argument("--sheet-index", type=int, default=None)
    p.add_argument("--skip-rows", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=5000)
    args = p.parse_args(argv)
    try:
        n = convert(
            args.input,
            args.output,
            sheet_name=args.sheet_name,
            sheet_index=args.sheet_index,
            skip_rows=args.skip_rows,
            batch_size=args.batch_size,
        )
    except DataToParquetError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    print(f"Successfully converted {n} rows to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
