"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship Engine-2 extraction end-to-end on the
sf0.001 scale; `queries()`/`oracle_sql()` expose every implemented
operator from SURVEY.md §2 (see pdf_extractor_spark/queries.py) with
DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pdf_extractor_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Engine-2 layout extraction → vacation adjustment →
    zero-filled byte-format PROVENTOS series (SURVEY §7.1 slice),
    scaled to the sf0.001 testdata corpus size."""
    return QUERIES["extract_e2_proventos"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
