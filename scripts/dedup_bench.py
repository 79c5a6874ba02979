"""End-to-end production-preset near-dup bench (VERDICT r2 item 7).

Builds an sf1-equivalent corpus (10x the sf0.1 documents table =
50,000 docs, deterministic replicas — no external data) and runs the
full neardup_clusters flow with the PRODUCTION preset
(k=128 hashes / 16 bands / 5-gram shingles / xxhash64), reporting
wall, candidate-pair count, verify rejection rate, and cluster stats.

Replica design (per original doc, replica r = 1..9, ids offset by
r * n_docs):
  r % 3 == 1  append one unique token        -> near-dup, verify ACCEPTS
  r % 3 == 2  replace a contiguous ~15% run  -> LSH often proposes it,
              word-Jaccard ~0.74 < 0.8       -> verify REJECTS
  r % 3 == 0  re-prefix every token          -> disjoint vocabulary,
              no shared shingles             -> never a candidate
Expected clusters: {original, r=1, r=4, r=7} per source doc (4
members) plus singletons.

Usage: python scripts/dedup_bench.py [--sf-dir DIR] [--replicas 10]
Writes BENCH/dedup_prod.json and prints its one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, replicas: int):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    n_docs = docs.count()
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    parts = [docs]
    for r in range(1, replicas):
        off = F.col("doc_id") + F.lit(r * n_docs)
        if r % 3 == 1:
            text = F.concat(F.col("text"), F.lit(f" xtra{r}"))
        elif r % 3 == 2:
            start = F.floor(n * 0.4)
            m = F.ceil(n * 0.15)
            text = F.concat_ws(
                " ",
                F.transform(
                    words,
                    lambda w, i: F.when(
                        (i >= start) & (i < start + m),
                        F.concat(F.lit(f"z{r}w"), i.cast("string")),
                    ).otherwise(w),
                ),
            )
        else:
            text = F.concat_ws(
                " ", F.transform(words, lambda w: F.concat(F.lit(f"r{r}_"), w))
            )
        parts.append(docs.select(off.alias("doc_id"), text.alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, n_docs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from rkts_migration_spark.operators.dedup import (
        PRESETS,
        neardup_candidates,
        neardup_clusters,
        neardup_verified_edges,
    )
    from rkts_migration_spark.session import get_spark

    spark = get_spark(app_name="dedup-bench",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
    prod = PRESETS["production"]
    kw = dict(k=prod["k"], bands=prod["bands"], shingle_n=prod["shingle_n"])

    corpus, n_src = build_corpus(spark, args.sf_dir, args.replicas)
    corpus = corpus.persist()
    n_total = corpus.count()  # materialize input outside the timed region

    # headline: the complete flow as a user runs it (candidates are
    # recomputed inside — no persist leaks into the timing)
    t0 = time.time()
    clusters = neardup_clusters(corpus, use_xxhash=True, **kw)
    n_rows = clusters.count()
    n_kept = clusters.filter("keep").count()
    wall = time.time() - t0

    # stage stats (separate pass, persisted candidate set)
    cand = neardup_candidates(corpus, use_xxhash=True, **kw).persist()
    n_cand = cand.count()
    n_edges = neardup_verified_edges(corpus, cand).count()
    cand.unpersist()

    cluster_sizes = (
        clusters.groupBy("cluster_id").count()
        .groupBy("count").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("count").collect()
    )
    result = {
        "metric": "neardup_prod_wall",
        "value": round(wall, 3),
        "unit": "sec",
        "preset": {**kw, "use_xxhash": True, "threshold_pct": 80},
        "n_docs": n_total,
        "n_source_docs": n_src,
        "docs_per_sec": round(n_total / wall, 1),
        "candidate_pairs": n_cand,
        "verified_edges": n_edges,
        "verify_rejection_rate": round(1 - n_edges / max(n_cand, 1), 4),
        "clusters_kept": n_kept,
        "cluster_size_histogram": {str(r["count"]): r["n"]
                                   for r in cluster_sizes},
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/dedup_prod.json", "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
