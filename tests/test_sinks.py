"""Sink shapes (SURVEY.md §2.1 K3/K4): CSV export and the
md5-bucketed partitioned JSON manifest write (migrate-bvm.py:412-418
analog — bucket dirs from substr(md5(key),1,2), sorted-key JSON)."""

from __future__ import annotations

import glob
import hashlib
import json
import os

from pyspark.sql import functions as F


def test_csv_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csv_out")
    df = spark.createDataFrame(
        [("K1", "D1/D2", 3), ("K2", "Q5", 1)], "rid string, refs string, n int")
    df.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out)
    assert sorted(tuple(r) for r in back.collect()) == [
        ("K1", "D1/D2", "3"), ("K2", "Q5", "1")]


def test_md5_bucketed_json_manifest_sink(spark, tmp_path):
    out = str(tmp_path / "bvm_out")
    df = spark.createDataFrame(
        [("I0901", 2, "vol 1"), ("I0902", 3, "vol 2")],
        "imggroup string, nbimages int, label string")
    bucketed = df.withColumn(
        "bucket", F.substring(F.md5("imggroup"), 1, 2))
    bucketed.write.partitionBy("bucket").json(out)

    back = spark.read.json(out)
    assert back.count() == 2
    # bucket dirs match the reference's md5 scheme
    for ig in ("I0901", "I0902"):
        want = hashlib.md5(ig.encode()).hexdigest()[:2]
        files = glob.glob(os.path.join(out, f"bucket={want}", "*.json"))
        assert files, f"no bucket dir for {ig}"
        rows = [json.loads(ln) for f in files for ln in open(f) if ln.strip()]
        assert any(r["imggroup"] == ig for r in rows)
        # JSON field order is deterministic (schema order)
        keys = [list(r.keys()) for r in rows]
        assert all(k == keys[0] for k in keys)
