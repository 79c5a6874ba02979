"""Measured recall/cost evidence for the production ANN paths
(VERDICT r3 #8): recall@k of lsh_topk_multitable and
ivf_topk(kmeans_centroids) against the exact cosine_topk baseline on
the sf0.1 embedding corpus, with wall time per variant — the
recall/cost dial gets numbers the way dedup has BENCH/dedup_prod.json.

Writes BENCH/ann_recall.json. Usage: python scripts/ann_recall_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 10
N_QUERIES = 100
DIM = 64


def main() -> int:
    from pyspark.sql import functions as F

    from rkts_migration_spark.operators.caching import release_cached_deps
    from rkts_migration_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
        lsh_topk_multitable,
    )
    from rkts_migration_spark.session import get_spark

    spark = get_spark(
        app_name="ann-recall",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) * 2,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB"},
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_base = base.count()
    # deterministic query subset: first N_QUERIES ids by xxhash order —
    # arbitrary but reproducible, and NOT the ids the kmeans sample is
    # seeded from (different hash salt)
    queries = (
        base.withColumn("_h", F.xxhash64(F.col("vec_id"), F.lit(7)))
        .orderBy("_h").limit(N_QUERIES).drop("_h")
    ).persist()
    queries.count()

    def neighbor_sets(df) -> dict:
        rows = df.collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    def timed(thunk):
        t0 = time.time()
        res = thunk()
        sets = neighbor_sets(res)
        return time.time() - t0, sets, res

    exact_sec, exact, _ = timed(lambda: cosine_topk(queries, base, k=K))

    def recall(approx: dict) -> float:
        num = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        den = sum(len(exact[q]) for q in exact)
        return round(num / den, 4)

    import inspect

    sig = inspect.signature(lsh_topk_multitable)
    default_cfg = (sig.parameters["n_planes"].default,
                   sig.parameters["n_tables"].default)
    results = {}
    for n_planes, n_tables in ((8, 4), (6, 8), (4, 16)):
        lsh_sec, lsh, lsh_df = timed(
            lambda: lsh_topk_multitable(
                queries, base, dim=DIM, k=K,
                n_planes=n_planes, n_tables=n_tables))
        release_cached_deps(lsh_df)
        rec = recall(lsh)
        is_default = (n_planes, n_tables) == default_cfg
        # recall floor on the SHIPPED default: a parameter change that
        # regresses the default to a near-random candidate generator
        # (the r4 8x4 foot-gun: 0.085) fails the bench loudly
        if is_default and rec < 0.85:
            raise AssertionError(
                f"default LSH config {default_cfg} measures recall@{K} "
                f"= {rec} < 0.85 floor — do not ship this default")
        results[f"lsh_p{n_planes}t{n_tables}"] = {
            "config": {"n_planes": n_planes, "n_tables": n_tables,
                       "is_shipped_default": is_default},
            "recall_at_k": rec,
            "wall_sec": round(lsh_sec, 3),
        }
    if default_cfg not in {(8, 4), (6, 8), (4, 16)}:
        raise AssertionError(
            f"shipped default {default_cfg} is not among the measured "
            "configs — add it to the sweep so the recall floor applies")

    t0 = time.time()
    cents = kmeans_centroids(base, n_cells=16)
    fit_sec = time.time() - t0
    for n_probe in (1, 4, 8):
        ivf_sec, ivf, _ = timed(
            lambda: ivf_topk(
                queries, base, k=K, n_probe=n_probe, centroids=cents))
        results[f"ivf_kmeans_probe{n_probe}"] = {
            "config": {"n_cells": 16, "n_probe": n_probe,
                       "quantizer_fit_sec": round(fit_sec, 3)},
            "recall_at_k": recall(ivf),
            "wall_sec": round(ivf_sec, 3),
        }

    out = {
        "metric": "ann_recall_at_k",
        "k": K,
        "n_queries": N_QUERIES,
        "n_base": n_base,
        "dim": DIM,
        "sf": SF_DIR,
        "parallelism": int(CPUS),
        # context for absolute recall: the synthetic embeddings are
        # near-uniform on the sphere, the hardest regime for ANN — a
        # random candidate set would hit k/n
        "random_baseline_recall": round(K / n_base, 4),
        "exact_wall_sec": round(exact_sec, 3),
        "variants": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ann_recall.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
