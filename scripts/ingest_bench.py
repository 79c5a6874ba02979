"""Measure continuous KG construction (streaming/incremental.
stream_kg_ingest) at bench scale: the sf0.1 transcript table split
into 4 conv-complete micro-batches plus an exact RE-DELIVERY of the
first batch, streamed through foreachBatch -> pipeline ->
merge_triples delta append.

Reports per-batch wall + appended triples, end-state duplicate-
freedom, and the idempotency number (re-delivered batch appends 0).
Writes BENCH/ingest_bench.json. Usage: python scripts/ingest_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BATCHES = 4
WORK = "/tmp/kg_ingest_bench"


def main() -> int:
    from pyspark.sql import functions as F

    from rkts_migration_spark.entrydata import transcripts_from_lineitem
    from rkts_migration_spark.fixtures import (
        TRANSCRIPT_DDL,
        fixtures_to_spark,
        make_fixtures,
    )
    from rkts_migration_spark.session import get_spark
    from rkts_migration_spark.streaming import (
        stream_from_directory,
        stream_kg_ingest,
    )

    spark = get_spark(
        app_name="ingest-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) * 2,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB"},
    )
    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "src")
    store = os.path.join(WORK, "store")
    os.makedirs(src)

    # conv-complete micro-batches: hash-split on conv_id (setup, untimed)
    tr = transcripts_from_lineitem(spark, SF_DIR)
    batch_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_BATCHES))
    # one FILE per drop: the file-source trigger is per file, and a
    # conversation split across files would violate the conv-complete-
    # batch contract of the foreachBatch pipeline
    for b in range(N_BATCHES):
        (tr.filter(batch_of == b)
         .coalesce(1).write.mode("append").parquet(src))
    # 5th drop: exact re-delivery of batch 0
    tr.filter(batch_of == 0).coalesce(1).write.mode("append").parquet(src)

    dicts = {k: v for k, v in
             fixtures_to_spark(spark, make_fixtures(seed=42, n_convs=1)).items()
             if k != "transcripts"}

    batches: list[dict] = []
    last = [time.monotonic()]

    def on_batch(bid: int, n: int) -> None:
        now = time.monotonic()
        batches.append({"batch": bid, "appended": n,
                        "wall_sec": round(now - last[0], 3)})
        last[0] = now

    t0 = time.monotonic()
    q = stream_kg_ingest(
        stream_from_directory(spark, src, TRANSCRIPT_DDL),
        dicts, store, os.path.join(WORK, "ckpt"), on_batch=on_batch)
    q.awaitTermination(1800)
    total_wall = time.monotonic() - t0

    got = spark.read.parquet(store)
    n_rows = got.count()
    n_distinct = got.distinct().count()
    total = sum(b["appended"] for b in batches)
    out = {
        "metric": "kg_ingest_throughput",
        "value": round(total / total_wall, 1),
        "unit": "triples/sec",
        "sf": SF_DIR,
        "parallelism": int(CPUS),
        "n_batches": len(batches),
        "batches": batches,
        "total_wall_sec": round(total_wall, 3),
        "total_triples": total,
        "store_rows": n_rows,
        "store_distinct": n_distinct,
        "redelivery_appended": batches[-1]["appended"] if batches else None,
    }
    assert n_rows == n_distinct == total, out
    assert out["redelivery_appended"] == 0, out
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ingest_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
