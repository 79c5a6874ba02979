"""Sequence packing for pretraining data prep: greedy first-fit of
documents into fixed token budgets (the Megatron/T5 shard-local
packing convention).

Packing is inherently order-dependent imperative logic — a running
bin accumulator — which no window/aggregate expresses, so this is a
legitimate mapInPandas use (SURVEY.md §2.10's bar for leaving the
JVM). Determinism is engineered around that: documents are
repartitioned by a hash of their id and sorted within partitions by
id BEFORE packing, so pack membership is a pure function of the data
(same packs at any input partitioning or parallelism — content-
addressed training shards stay stable across reruns). Packing is
shard-local by design: globally optimal bin packing is NP-hard,
cross-shard packing would serialize the corpus, and the training
consumer only needs per-shard density, not a global optimum.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id string, n_tokens long, pack_id string"


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
) -> DataFrame:
    """Assign each document to a pack of at most ``budget`` whitespace
    tokens: (doc_id, n_tokens, pack_id), pack_id = the first doc id in
    the pack (deterministic, no counters shared across partitions).
    Documents longer than the budget get a singleton pack — truncation
    is the tokenizer stage's decision, not the packer's.

    Scale shape: one deterministic hash repartition + in-partition
    sort, then a single Arrow pass; the running accumulator holds one
    pack's worth of state, so memory is O(budget), not O(partition).
    """
    import pandas as pd

    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    sized = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        toks.alias("n_tokens"),
    )
    shards = n_shards or sized.sparkSession.sparkContext.defaultParallelism
    # repartition on a pure function of the id (NOT round-robin, which
    # depends on input split order) then sort: pack membership becomes
    # a function of the data alone.
    arranged = (
        sized.repartition(shards, F.xxhash64("doc_id"))
        .sortWithinPartitions("doc_id")
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_ids: list[str] = []
        cur_tokens: list[int] = []
        cur_total = 0

        def flush() -> pd.DataFrame:
            nonlocal cur_ids, cur_tokens, cur_total
            out = pd.DataFrame({
                "doc_id": cur_ids,
                "n_tokens": pd.Series(cur_tokens, dtype="int64"),
                "pack_id": cur_ids[0] if cur_ids else None,
            })
            cur_ids, cur_tokens, cur_total = [], [], 0
            return out

        for pdf in batches:  # state carries across Arrow batches
            for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
                n = int(n)
                if cur_ids and cur_total + n > budget:
                    yield flush()
                cur_ids.append(doc_id)
                cur_tokens.append(n)
                cur_total += n
                if cur_total >= budget:  # full (or oversized singleton)
                    yield flush()
        if cur_ids:
            yield flush()

    return arranged.mapInPandas(pack, PACK_SCHEMA)
