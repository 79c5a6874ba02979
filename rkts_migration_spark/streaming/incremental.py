"""Structured Streaming wrapper over the batch pipeline.

Design: ``foreachBatch`` + the batch operators, NOT a parallel
streaming implementation. Each micro-batch holds complete
conversations (source must deliver a conversation's turns within one
batch, or the caller buffers with a session-gap watermark upstream);
triple semantics are then byte-identical to the batch path because the
SAME functions run. This is the recommended Spark pattern for complex
batch logic over streams and keeps one source of truth for semantics.

For late/out-of-order turns the entry point exposes a watermark +
session-window pre-aggregation (``stream_from_directory`` uses a
simple per-file micro-batch; a Kafka source would set
``withWatermark("ts", ...)`` identically).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import build_triples_inmem


def stream_triples(
    transcript_stream: DataFrame,
    dict_tables: dict[str, DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire a streaming transcripts DataFrame through the batch pipeline.

    ``dict_tables``: gazetteer/id_remap/cross_corpus_map/same_text_map/
    abstract_map/entity_props (static side inputs, broadcast each batch).
    ``sink(batch_triples_df, batch_id)`` commits each micro-batch —
    append an Iceberg snapshot in production.
    """

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        tables = dict(dict_tables)
        tables["transcripts"] = batch_df
        triples = build_triples_inmem(batch_df.sparkSession, tables)
        sink(triples, batch_id)

    writer = (
        transcript_stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_kg_ingest(
    transcript_stream: DataFrame,
    dict_tables: dict[str, DataFrame],
    store_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Continuous KG construction with idempotent appends: each
    micro-batch runs the full batch pipeline (same functions, same
    semantics), anti-joins the committed triple store
    (operators/graph.merge_triples) and appends ONLY the delta.

    This upgrades at-least-once delivery to exactly-once *effect* on
    the triple set: a re-delivered batch (source retry, crawler
    overlap, checkpoint replay) computes the same candidate triples,
    every one of which is already in the store, so the delta is empty
    and the append is a no-op. The store itself is the idempotency
    ledger — no side state to maintain or expire.

    Scale shape: the anti-join shuffles on the full (subj, pred, obj)
    key with the BIG side (the store) streamed, never broadcast or
    collected; the micro-batch side is the small one. On a real
    deployment ``store_dir`` is an Iceberg table and the
    read-anti-join-append becomes a single ``MERGE INTO ... WHEN NOT
    MATCHED THEN INSERT`` commit (one snapshot per micro-batch, safe
    under concurrent readers); the parquet-dir fallback here has the
    identical dataflow. ``on_batch(batch_id, n_appended)`` surfaces
    per-batch lineage metrics.

    Lineage parity with the batch stages (sources/tables.write_stage):
    every processed micro-batch writes a manifest row under
    ``<store_dir>/_INGEST_MANIFESTS/batch_<id>.json`` AFTER its delta
    is appended — batch id, input rows, appended triples — so an
    auditor can reconstruct which micro-batch contributed which
    append, the streaming analog of the manifest-last stage-commit
    convention (zero-append re-deliveries get a manifest too, which
    is itself the idempotency evidence).
    """
    import json
    import os

    from pyspark.errors import AnalysisException

    from ..operators.graph import merge_triples

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = dict(dict_tables)
        tables["transcripts"] = batch_df
        n_input = batch_df.count()
        candidates = build_triples_inmem(spark, tables)
        try:
            existing = spark.read.parquet(store_dir)
        except AnalysisException:  # first batch: nothing committed yet
            existing = spark.createDataFrame([], candidates.schema)
        delta = merge_triples(existing, candidates).persist()
        n_appended = delta.count()
        if n_appended:
            delta.write.mode("append").parquet(store_dir)
        delta.unpersist()
        mdir = os.path.join(store_dir, "_INGEST_MANIFESTS")
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, f"batch_{batch_id:06d}.json"), "w") as f:
            json.dump({"batch_id": batch_id, "input_rows": n_input,
                       "appended_triples": n_appended}, f)
        if on_batch is not None:
            on_batch(batch_id, n_appended)

    writer = (
        transcript_stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_from_directory(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream of transcript parquet drops (one conversation
    set per file). Kafka/Iceberg-CDC sources plug in the same way."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def late_tolerant_turn_counts(
    transcript_stream: DataFrame,
    watermark: str = "10 minutes",
    session_gap: str = "30 minutes",
) -> DataFrame:
    """Watermarked session-window aggregation over a turn stream:
    per-conversation activity sessions with turn counts, tolerating
    late/out-of-order turns up to the watermark. This is the
    late-data pre-aggregation SURVEY.md §2.9 describes for buffering
    conversations before the batch operators run on complete sessions
    (Structured Streaming's session_window + withWatermark — state is
    dropped once the watermark passes the session gap)."""
    from pyspark.sql import functions as F

    return (
        transcript_stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", session_gap).alias("session"),
            F.col("conv_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns", "first_turn", "last_turn",
        )
    )


def stateful_turn_totals(transcript_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-conversation cumulative turn totals maintained across
    micro-batches (the arbitrary-state API for operators the built-in
    windows can't express). Emits one row per (conversation,
    micro-batch) with the batch's turn count and the running total."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "conv_id string, batch_turns int, total_turns int"
    state_schema = "total int"

    def update(key, pdfs, state):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "batch_turns": [n], "total_turns": [total]})

    return (
        transcript_stream.groupBy("conv_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_exact_dedup(
    doc_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for corpus ingestion: re-deliveries of
    byte-identical content (retries, crawler overlap, at-least-once
    sources) are dropped ACROSS micro-batches. The key is a content
    address (sha2 of the text), so the dedup state stores one short
    hash per distinct document — never the text — and
    ``dropDuplicatesWithinWatermark`` evicts a hash once the event-time
    watermark passes it, bounding state for an unbounded stream (a
    plain ``dropDuplicates`` on a stream accumulates state forever).
    The batch analog is operators/dedup.exact_dedup — same key, same
    first-wins semantics within the watermark horizon."""
    from pyspark.sql import functions as F

    keyed = doc_stream.withWatermark(ts_col, watermark).withColumn(
        "_content_sha", F.sha2(F.col(text_col), 256)
    )
    return keyed.dropDuplicatesWithinWatermark(["_content_sha"]).drop(
        "_content_sha"
    )
