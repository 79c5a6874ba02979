"""Graph post-processing operators (operators/graph.py): degree, k-hop
BFS, deterministic fixed-point PageRank, incremental triple merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from rkts_migration_spark.operators.graph import (
    PR_SCALE,
    degree_stats,
    k_hop,
    merge_triples,
    pagerank_fixed_point,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_degree_stats_hub(spark):
    # hub 'h' -> 4 leaves, one back-edge
    pairs = [("h", f"l{i}") for i in range(4)] + [("l0", "h")]
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degree_stats(_edges(spark, pairs)).collect()}
    assert got["h"] == (4, 1)
    assert got["l0"] == (1, 1)
    assert got["l3"] == (0, 1)


def test_k_hop_chain_min_distance(spark):
    # a-b-c-d-e chain plus a shortcut a-c: c must be hop 1, not 2
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")]
    seeds = _edges(spark, [("a", "x")]).select(F.col("src").alias("node"))
    got = {r["node"]: r["hop"] for r in k_hop(_edges(spark, pairs), seeds, k=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_k_hop_early_termination_and_bound(spark):
    # two-node component: BFS exhausts at hop 1 and stops early; the
    # disconnected component is never visited
    pairs = [("a", "b"), ("x", "y")]
    seeds = _edges(spark, [("a", "_")]).select(F.col("src").alias("node"))
    got = {r["node"]: r["hop"] for r in k_hop(_edges(spark, pairs), seeds, k=5).collect()}
    assert got == {"a": 0, "b": 1}


def test_pagerank_star_orders_hub_first(spark):
    pairs = [("hub", f"l{i}") for i in range(5)]
    ranks = {r["node"]: r["rank_u"]
             for r in pagerank_fixed_point(_edges(spark, pairs), iterations=3).collect()}
    assert ranks["hub"] > ranks["l0"]
    assert len({ranks[f"l{i}"] for i in range(5)}) == 1  # leaves tie exactly
    # integer mass: never exceeds PR_SCALE, loses only division remainders
    total = sum(ranks.values())
    assert total <= PR_SCALE
    assert total > PR_SCALE * 0.99


def test_pagerank_bit_identical_across_parallelism(spark):
    """The design claim: integer arithmetic makes ranks EXACTLY equal
    under different partitionings (float PageRank would drift in the
    last ulps with summation order)."""
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(40)] + [
        (f"n{i}", f"n{(i + 1) % 40}") for i in range(40)
    ]
    e1 = _edges(spark, pairs).repartition(1)
    e2 = _edges(spark, pairs).repartition(32)
    r1 = sorted(map(tuple, pagerank_fixed_point(e1, iterations=4).collect()))
    r2 = sorted(map(tuple, pagerank_fixed_point(e2, iterations=4).collect()))
    assert r1 == r2


def test_merge_triples_delta_and_idempotency(spark):
    schema = "subj string, pred string, obj string"
    existing = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2")], schema)
    incoming = spark.createDataFrame(
        [("s2", "p", "o2"), ("s3", "p", "o3"), ("s3", "p", "o3")], schema)
    delta = merge_triples(existing, incoming)
    assert [tuple(r) for r in delta.collect()] == [("s3", "p", "o3")]
    # idempotent: re-delivering an already-committed batch appends nothing
    committed = existing.unionByName(delta)
    assert merge_triples(committed, incoming).isEmpty()


def test_compact_labels_restores_invariant(spark):
    """Two pref labels for the same (entity, lang) — the batch-variance
    artifact of independent-batch ingest — compact to the lexicographic
    min; other langs/preds/triples untouched; idempotent."""
    from rkts_migration_spark import vocab as V
    from rkts_migration_spark.operators.graph import compact_labels

    schema = "subj string, pred string, obj string"
    store = spark.createDataFrame(
        [
            ("e1", V.PRED_PREF_LABEL, '"Zebra"@en'),
            ("e1", V.PRED_PREF_LABEL, '"Apple"@en'),   # dup winner
            ("e1", V.PRED_PREF_LABEL, '"Uno"@es'),     # other lang kept
            ("e1", V.PRED_ALT_LABEL, '"Alt"@en'),
            ("e2", V.PRED_PREF_LABEL, '"Solo"@en'),
            ("e1", "http://x/p/other", '"not a label"@en'),
        ],
        schema,
    )
    got = {tuple(r) for r in compact_labels(store).collect()}
    assert got == {
        ("e1", V.PRED_PREF_LABEL, '"Apple"@en'),
        ("e1", V.PRED_PREF_LABEL, '"Uno"@es'),
        ("e1", V.PRED_ALT_LABEL, '"Alt"@en'),
        ("e2", V.PRED_PREF_LABEL, '"Solo"@en'),
        ("e1", "http://x/p/other", '"not a label"@en'),
    }
    # idempotent
    twice = {tuple(r) for r in
             compact_labels(compact_labels(store)).collect()}
    assert twice == got
