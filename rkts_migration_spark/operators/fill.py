"""Ordered fill operators: forward-attach (W6) and carry-last (W7).

Distributed forms of the reference's imperative passes:
- attach_to_next: pages whose image is missing take the NEXT
  non-missing image number (/root/reference/utils.php:240-275,312-346)
  -> first(ignorenulls) over [current, unbounded following].
- carry_last_seen: unused files attach after the last used file
  (/root/reference/migrate-bvm.py:286-316) -> last(ignorenulls) over
  [unbounded preceding, current].

Both are single-window ops: one shuffle on the partition key, no
iteration, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attach_to_next(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.first(value_col, ignorenulls=True).over(w),
    )


def carry_last_seen(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or f"{value_col}_carried",
        F.last(value_col, ignorenulls=True).over(w),
    )
