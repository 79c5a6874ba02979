"""Stage-table IO with atomic-commit semantics.

Iceberg (`spark.write.format("iceberg")`) is the production format for
the triple/stage tables per BASELINE north_rule; when the runtime jar
is absent (this sandbox) the fallback writes parquet into a temp dir
and renames it into place, then writes the manifest LAST — a reader
treats a stage as committed only when the manifest exists, so partial
writes are never resumed from. Same contract, either backend.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_STAGE_MANIFEST.json"


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def stage_path(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def stage_manifest(root: str, stage: str) -> dict | None:
    p = os.path.join(stage_path(root, stage), MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_is_complete(root: str, stage: str) -> bool:
    m = stage_manifest(root, stage)
    return bool(m and m.get("complete"))


def write_stage(
    df: DataFrame,
    root: str,
    stage: str,
    run_id: str,
    partition_by: list[str] | None = None,
) -> dict:
    """Write a stage table + lineage manifest; returns the manifest.

    Lineage = per-output-partition row counts (spark_partition_id), the
    per-partition accounting BASELINE north_rule requires. Computed in
    the same job cache as the write via a cheap second aggregation over
    the persisted data (reading back parquet footers is metadata-only
    for counts, but per-partition needs the id column, so we stamp it).
    """
    spark = df.sparkSession
    path = stage_path(root, stage)
    stamped = df.withColumn("_part_id", F.spark_partition_id())
    tmp = path + f"._tmp_{uuid.uuid4().hex[:8]}"
    t0 = time.time()

    if _has_iceberg(spark):
        # Production path: Iceberg table, atomic snapshot commit.
        writer = stamped.write.format("iceberg").mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        written = spark.read.format("iceberg").load(path)
    else:
        writer = stamped.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        written = spark.read.parquet(path)

    lineage = [
        {"partition_id": r["_part_id"], "rows": r["rows"]}
        for r in written.groupBy("_part_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    ]
    try:  # stage metrics: on-disk footprint (parquet fallback path)
        n_bytes = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(path) for fn in fns
        )
    except OSError:
        n_bytes = None
    manifest = {
        "stage": stage,
        "run_id": run_id,
        "complete": True,
        "rows": sum(p["rows"] for p in lineage),
        "n_partitions": len(lineage),
        "partitions": sorted(lineage, key=lambda p: p["partition_id"]),
        "metrics": {"write_wall_sec": round(time.time() - t0, 3),
                    "bytes": n_bytes},
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    path = stage_path(root, stage)
    if _has_iceberg(spark):
        try:
            return spark.read.format("iceberg").load(path).drop("_part_id")
        except Exception:
            pass
    return spark.read.parquet(path).drop("_part_id")
