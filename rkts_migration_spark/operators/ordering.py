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


def conversations_as_documents(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    include_role: bool = True,
) -> DataFrame:
    """Render each conversation as ONE training document: turns
    concatenated in stable (turn_idx) order, optionally prefixed with
    their role ("role: text" lines). Returns (doc_id = conv_id, text,
    n_turns).

    This is the bridge from the KG side (turn-grained) to the
    training-data side (document-grained): the dedup / decontamination
    / quality / sampling operators all take (doc_id, text), so a chat
    corpus flows conversations -> documents -> those passes unchanged.

    Determinism matters more than it looks: the document BYTES must
    not depend on partitioning, or content-addressed dedup keys
    (sha2/minhash) would differ run-to-run. collect_list is
    order-nondeterministic, so turns are collected as (turn_idx, line)
    structs and array_sort-ed before joining — bytes are then a pure
    function of the data. One groupBy(conv_id) shuffle; per-group
    memory is conversation-bounded (same bound every window in the
    pipeline already relies on)."""
    line = (
        F.concat_ws(": ", F.col("role"), F.col(text_col))
        if include_role else F.col(text_col)
    )
    return (
        df.groupBy(F.col("conv_id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("turn_idx"), line.alias("_line")))),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
