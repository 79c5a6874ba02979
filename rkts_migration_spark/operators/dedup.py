"""Order-aware dedup (A1/A2) + document-level dedup family.

first_wins: the distributed form of the reference's `seenTitles` /
`seenLangs` sets (/root/reference/kernelxmltottl.php:88-89,205-227):
within each group, the row with the smallest order key survives.
NOT dropDuplicates — that keeps an arbitrary row; here order is the
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_wins(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Keep the first row per group under a total order (ties broken by
    the full order-col tuple, which callers make unique)."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_rank")
    )


def with_first_flag(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    flag_col: str = "is_first",
) -> DataFrame:
    """Like first_wins but keeps every row, flagging the winner —
    prefLabel (first) vs altLabel (rest) in one pass."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(flag_col, F.row_number().over(w) == 1)


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content dedup: keep one representative per sha2(text)
    (min of the remaining columns' natural order keeps it
    deterministic). Scales as one hash-shuffle; at 100 TB partial
    aggregation makes the map side absorb most duplicates."""
    key = F.sha2(F.col(text_col), 256).alias("_h")
    cols = df.columns
    return (
        df.select(key, F.struct(*cols).alias("_row"))
        .groupBy("_h")
        .agg(F.min("_row").alias("_row"))
        .select("_row.*")
    )
