"""End-to-end training-data prep over the real documents table: the
claim being tested is COMPOSITION — exact dedup -> near-dup
clustering -> benchmark decontamination -> quality/repetition gates ->
stratified mixing -> sequence packing all chain on the same
(doc_id, text) contract, each stage's output feeding the next, with
row-accounting invariants at every step. This is the "a user runs
their whole corpus prep on this engine" test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_training_data_prep_end_to_end(spark):
    from rkts_migration_spark.operators.dedup import (
        exact_dedup,
        flag_contaminated,
        neardup_clusters,
    )
    from rkts_migration_spark.operators.packing import pack_documents
    from rkts_migration_spark.operators.textstats import (
        stratified_sample,
        with_quality,
        with_repetition_stats,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"),
                "text", "lang")
        .filter(F.length("text") > 0)
    )
    n0 = docs.count()
    assert n0 > 0

    # 1. exact dedup (byte-identical mass duplicates out BEFORE LSH —
    #    the ordering the hot-bucket guard docs rely on)
    exact = exact_dedup(docs, "text")
    n1 = exact.count()
    assert 0 < n1 <= n0

    # 2. near-dup clustering: keep one representative per cluster
    clusters = neardup_clusters(exact, k=16, bands=4, shingle_n=3,
                                threshold_pct=80)
    kept_ids = clusters.filter(F.col("keep")).select("doc_id")
    n2 = kept_ids.count()
    assert 0 < n2 <= n1

    # 3. decontamination: a benchmark built from one kept doc's text
    #    must flag that doc; purge is the left_anti composition
    sample_doc = exact.join(kept_ids, "doc_id").limit(1).collect()[0]
    benchmark = spark.createDataFrame(
        [("b0", sample_doc["text"])], "doc_id string, text string")
    survivors = exact.join(kept_ids, "doc_id")
    flagged = flag_contaminated(survivors, benchmark, n=5)
    flagged_ids = {r["doc_id"] for r in flagged.collect()}
    assert sample_doc["doc_id"] in flagged_ids
    clean = survivors.join(flagged.select("doc_id"), "doc_id", "left_anti")
    n3 = clean.count()
    assert n3 == n2 - len(flagged_ids)

    # 4. quality + repetition gates (integer-arithmetic flags)
    gated = with_repetition_stats(with_quality(clean, min_tokens=3))
    passed = gated.filter((F.col("passes_quality") == 1)
                          & (F.col("passes_repetition") == 1))
    n4 = passed.count()
    assert 0 < n4 <= n3

    # 5. deterministic per-language mixing
    langs = [r["lang"] for r in passed.select("lang").distinct().collect()]
    mixed = stratified_sample(
        passed, "lang", {lg: 0.9 for lg in langs}, "doc_id")
    n5 = mixed.count()
    assert 0 < n5 <= n4

    # 6. sequence packing: every sampled doc lands in exactly one pack
    packed = pack_documents(mixed, budget=512, n_shards=4)
    assert packed.count() == n5
    assert packed.select("doc_id").distinct().count() == n5
    over = (packed.groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("m"))
            .filter((F.col("t") > 512) & (F.col("m") > 1)))
    assert over.isEmpty()  # only oversized singletons may exceed budget
