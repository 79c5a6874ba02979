"""BVM manifest-assembly integration (SURVEY.md §3.2 analog): the
pagination JSON and image-list JSON sources joined per (volume, file)
— J9, migrate-bvm.py:95-156 — with missing images forward-attached
(W6) and unused files carried after the last seen file (W7), all as
one join + two windows, no driver loops."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from rkts_migration_spark.operators.fill import attach_to_next, carry_last_seen
from rkts_migration_spark.sources.dictionaries import (
    read_image_lists,
    read_pagination_maps,
)


def _write_fixtures(d):
    os.makedirs(d)
    # image list: 6 files in scan order
    imgs = [
        {"filename": f"I{n:03d}.tif", "width": 100, "height": 200}
        for n in range(1, 7)
    ]
    with gzip.open(os.path.join(d, "W9.json.gz"), "wt") as f:
        json.dump(imgs, f)
    # pagination references only files 2, 3 and 6; idx 30's file is
    # absent from the image list ("missing" image)
    pg = {
        "10": {"pagination": "1a", "psection": "s1", "file": "I002.tif"},
        "20": {"pagination": "1b", "psection": "s1", "file": "I003.tif"},
        "30": {"pagination": "2a", "psection": "s1", "file": "GONE.tif"},
        "40": {"pagination": "2b", "psection": "s1", "file": "I006.tif"},
    }
    with gzip.open(os.path.join(d, "W9_pg.json.gz"), "wt") as f:
        json.dump(pg, f)


def test_bvm_join_and_fills(spark, tmp_path):
    d = str(tmp_path / "bvm")
    _write_fixtures(d)
    il = read_image_lists(spark, d + "/W9.json.gz")
    pg = read_pagination_maps(spark, d + "/W9_pg.json.gz").withColumn(
        "volume", F.lit("W9")  # pagination file name carries a suffix
    )

    # J9: file name -> image number (equi-join on volume+filename)
    joined = pg.join(
        il.select("volume", F.col("filename").alias("file"), "imgnum"),
        ["volume", "file"],
        "left",
    )

    # W6: the missing image (idx 30) takes the NEXT present imgnum
    filled = attach_to_next(
        joined, "imgnum", partition_cols=["volume"], order_cols=["idx"],
        out_col="imgnum_eff")
    got = {r["idx"]: (r["imgnum"], r["imgnum_eff"]) for r in filled.collect()}
    assert got[10] == (2, 2)
    assert got[20] == (3, 3)
    assert got[30] == (None, 6)  # forward-attached to I006's number
    assert got[40] == (6, 6)

    # W7: unused image files attach after the last used ("seen") file
    used = pg.select("volume", F.col("file").alias("filename")).distinct()
    flagged = il.join(
        used.withColumn("is_used", F.lit(True)), ["volume", "filename"], "left"
    ).withColumn("seen_file", F.when(F.col("is_used"), F.col("filename")))
    carried = carry_last_seen(
        flagged, "seen_file", partition_cols=["volume"],
        order_cols=["imgnum"], out_col="attach_after")
    got = {r["filename"]: r["attach_after"] for r in carried.collect()}
    # I001 precedes any used file -> leading unused (prepended, None)
    assert got["I001.tif"] is None
    # I004/I005 are unused and follow used I003 -> attach after it
    assert got["I004.tif"] == "I003.tif"
    assert got["I005.tif"] == "I003.tif"
    assert got["I002.tif"] == "I002.tif"
    assert got["I006.tif"] == "I006.tif"
