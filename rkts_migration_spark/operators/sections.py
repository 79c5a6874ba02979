"""Section islands: gaps-and-islands over an ordered change signal.

Distributed form of the reference's sequential section-change detection
(`$section != $lastsection` loop, /root/reference/editionxmltottl.php:150-162):
    change_flag = (lag(key) != key)            -- W2
    section_idx = running sum of change_flag   -- island id, 1-based
    begin/end   = first/last turn per island   -- W5 analog
One shuffle (by conv_id); every window below shares that partitioning,
so Spark plans a single Exchange reused by all four window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_section_index(
    df: DataFrame,
    change_col: str = "role",
    out_col: str = "section_idx",
) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    changed = (
        F.lag(change_col).over(w).isNull()
        | (F.lag(change_col).over(w) != F.col(change_col))
    ).cast("int")
    run = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(changed).over(run))


def section_bounds(df_with_idx: DataFrame, idx_col: str = "section_idx") -> DataFrame:
    """One row per (conv_id, section_idx) with begin/end turn_idx."""
    return df_with_idx.groupBy("conv_id", idx_col).agg(
        F.min("turn_idx").alias("begin_turn_idx"),
        F.max("turn_idx").alias("end_turn_idx"),
    )
