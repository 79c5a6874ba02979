"""Stable turn ordering (W11) + running ordinals (W1).

The analog of the reference's load-bearing XML document order
(/root/reference/editionxmltottl.php:432-435): every order-sensitive
operator downstream keys its window on (conv_id, turn_idx), never on
physical row order, so repartitioning can never break semantics —
the correctness constraint SURVEY.md §4.3 calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_ORDER = ("conv_id", "turn_idx")


def conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def with_turn_ordinal(df: DataFrame, col_name: str = "turn_ord") -> DataFrame:
    """1-based dense position of each turn inside its conversation
    (running-counter analog of editionxmltottl.php:35)."""
    return df.withColumn(col_name, F.row_number().over(conv_window()))


def assert_contiguous(df: DataFrame) -> DataFrame:
    """Lineage check: turn_idx must be 0..n-1 contiguous per conv.
    Returns a DataFrame of violations (empty = healthy); kept as data,
    not an exception, so it can flow into the run's metrics table."""
    w = conv_window()
    return (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .filter(F.col("_rn") != F.col("turn_idx"))
        .select("conv_id", "turn_idx", "_rn")
    )
