"""Skew salting: two-phase (partial + final) aggregation.

Long conversations are Zipf-skewed (FIXTURES.md §1), so a naive
groupBy(conv_id) puts the hot key on one reducer. Salting splits each
key into `buckets` sub-keys for the first (wide) aggregation, then
re-merges — the explicit mitigation SURVEY.md §4.1 requires, with AQE
skew-join handling as the backstop, not the plan.

The salt is derived from data columns (not rand()) so retried tasks
produce identical partials — idempotence under speculative execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(cols: Sequence[Column], buckets: int) -> Column:
    return F.pmod(F.hash(*cols), F.lit(buckets))


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_from: Sequence[str],
    buckets: int = 16,
    out_col: str = "cnt",
) -> DataFrame:
    """count(*) grouped by `keys`, shuffled in two phases:
    (keys + salt) partial counts, then (keys) final sum."""
    salted = df.withColumn(
        "_salt", salt_col([F.col(c) for c in salt_from], buckets)
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("long").alias(out_col))
