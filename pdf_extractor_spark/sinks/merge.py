"""K1 — keyed write-if-empty merge (Excel-sink semantics on tables).

The reference writes an extracted value into a target cell only when
the cell is empty or zero (``pdf_processor_core.py:769-772``), which
makes re-runs idempotent. On Iceberg this is:

    MERGE INTO target t USING updates u ON <keys>
    WHEN MATCHED AND (t.value IS NULL OR t.value = 0)
         THEN UPDATE SET t.value = u.value
    WHEN NOT MATCHED THEN INSERT *

The sandbox has plain parquet, so `merge_if_empty` emulates the same
MERGE as a full-outer join + conditional select, and the caller
round-trips through parquet (snapshot isolation is the missing piece
Iceberg adds; semantics of the resulting table are identical and the
idempotence test pins it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_if_empty(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Fill-only-if-empty upsert: existing non-null/non-zero target
    values win; empty or missing cells take the update value.

    Both sides must share the key columns and `value_col`. Extra target
    columns are preserved; extra update columns are dropped.
    """
    upd = updates.select(
        *keys, F.col(value_col).alias("__upd_value")
    ).dropDuplicates(keys)
    t_val = F.col(value_col)
    # try_cast, not cast: under Spark 4 ANSI a non-numeric target string
    # (E1 time values like '05,08') would make cast throw
    # NumberFormatException. try_cast yields NULL there, the comparison
    # is NULL, when() treats it as false → the existing non-empty cell
    # wins, which is exactly the reference's fill-if-empty semantics.
    empty = t_val.isNull() | (t_val.try_cast("double") == 0.0)
    merged = (
        target.join(upd, keys, "full_outer")
        .withColumn(
            value_col,
            F.when(empty, F.coalesce("__upd_value", value_col)).otherwise(t_val),
        )
        .drop("__upd_value")
    )
    return merged
