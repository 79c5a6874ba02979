"""Dictionary/side-input source loaders (SURVEY.md §2.1 S3-S7):
CSV multimap/filtered-map shapes and the gzipped-JSON image-list /
pagination readers (il-cache + migrate-bvm shapes), including the
transparent .gz codec path."""

from __future__ import annotations

import gzip
import json
import os

from rkts_migration_spark.sources.dictionaries import (
    read_filtered_map_csv,
    read_image_lists,
    read_multimap_csv,
    read_pagination_maps,
)


def test_multimap_csv(spark, tmp_path):
    p = tmp_path / "actors.csv"
    p.write_text("E1,ab,T100\nE1,ab,T101\nE1,ge,G7\nE2,ge,G2\n")
    rows = {
        (r["id"], r["prop"]): sorted(r["objs"])
        for r in read_multimap_csv(spark, str(p)).collect()
    }
    assert rows[("E1", "ab")] == ["T100", "T101"]
    assert rows[("E1", "ge")] == ["G7"]
    assert rows[("E2", "ge")] == ["G2"]


def test_filtered_map_csv_drops_placeholder_keys(spark, tmp_path):
    p = tmp_path / "abstract.csv"
    # val,key column order (abstract-rkts.csv shape, utils.php:872-897)
    p.write_text("WA1,E1\nWA2,?\nWA3,\nWA4,E4\nWA0,E1\n")
    got = {r["key"]: r["val"] for r in read_filtered_map_csv(spark, str(p)).collect()}
    assert got == {"E1": "WA0", "E4": "WA4"}  # min val wins on dup key


def test_image_lists_gzipped_json(spark, tmp_path):
    d = tmp_path / "il"
    os.makedirs(d)
    imgs = [
        {"filename": "I001.tif", "width": 100, "height": 200},
        {"filename": "I002.tif", "width": 101, "height": 201},
    ]
    with gzip.open(d / "I0577.json.gz", "wt") as f:
        json.dump(imgs, f)
    (d / "I0900.json").write_text(json.dumps(imgs[:1]))
    got = read_image_lists(spark, str(d) + "/*").collect()
    by_vol = {}
    for r in got:
        by_vol.setdefault(r["volume"], []).append(
            (r["imgnum"], r["filename"], r["width"], r["height"]))
    assert sorted(by_vol["I0577"]) == [
        (1, "I001.tif", 100, 200), (2, "I002.tif", 101, 201)]
    assert sorted(by_vol["I0900"]) == [(1, "I001.tif", 100, 200)]


def test_pagination_maps(spark, tmp_path):
    d = tmp_path / "pg"
    os.makedirs(d)
    data = {
        "10": {"pagination": "5a", "psection": "s1", "file": "f10.tif"},
        "2": {"pagination": "1b", "psection": "s1", "file": "f2.tif"},
    }
    with gzip.open(d / "W123.json.gz", "wt") as f:
        json.dump(data, f)
    got = sorted(
        (r["volume"], r["idx"], r["pagination"], r["file"])
        for r in read_pagination_maps(spark, str(d) + "/*").collect()
    )
    # idx is numeric (the ksort analog): 2 < 10
    assert got == [
        ("W123", 2, "1b", "f2.tif"), ("W123", 10, "5a", "f10.tif")]
