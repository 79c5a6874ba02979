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


def test_xml_outline_sink(spark, tmp_path):
    """K5+F19 analog (sqltoxml.py:27-42,140-150): one <outline>
    document per collection, items in ordinal order, text escaped with
    xml.sax.saxutils.escape parity; the fragment render and global
    sort are distributed, only the final byte stitch is serial."""
    import xml.etree.ElementTree as ET
    from xml.sax.saxutils import escape

    from rkts_migration_spark.functions.text import xml_escape_col
    from rkts_migration_spark.sources.xml_sink import write_xml_outline

    rows = [
        ("K", 2, "K0002", "b <&> c"),
        ("K", 1, "K0001", "a & b"),
        ("T", 1, "T0001", 'quote " stays'),
        ("K", 3, "K0003", "plain"),
    ]
    df = spark.createDataFrame(
        rows, "coll string, ord int, rkts string, tib string"
    ).repartition(4)  # prove order survives arbitrary input partitioning
    item = F.format_string(
        "<item><rkts>%s</rkts><tib>%s</tib></item>",
        F.col("rkts"), xml_escape_col(F.col("tib")),
    )
    out = str(tmp_path / "xml_out")
    paths = write_xml_outline(df, "coll", item, ["ord"], out)
    assert set(paths) == {"K", "T"}

    root = ET.parse(paths["K"]).getroot()
    assert root.tag == "outline"
    items = root.findall("item")
    assert [i.find("rkts").text for i in items] == ["K0001", "K0002", "K0003"]
    # escape() round-trips through the parser back to the raw value
    assert [i.find("tib").text for i in items] == ["a & b", "b <&> c", "plain"]
    raw = open(paths["K"], encoding="utf-8").read()
    assert escape("b <&> c") in raw and raw.endswith("</outline>")
    t_items = ET.parse(paths["T"]).getroot().findall("item")
    assert [i.find("tib").text for i in t_items] == ['quote " stays']


def test_xml_sink_newlines_nulls_escaped_partitions(spark, tmp_path):
    """Round 3 hardening: (a) embedded \\n/\\r in text content survive
    the line-oriented fragment write as character references and parse
    back byte-identical; (b) nullable fields render through xml_opt_tag
    as omitted tags (reference omits tags for null fields), while a
    null FRAGMENT fails loud; (c) partition-dir percent-escaping of
    the collection value ('=' -> %3D) is undone in the returned keys."""
    import xml.etree.ElementTree as ET

    from pyspark.errors import SparkRuntimeException

    from rkts_migration_spark.functions.text import xml_escape_col
    from rkts_migration_spark.sources.xml_sink import (
        write_xml_outline,
        xml_opt_tag,
    )

    rows = [
        ("K=1", 1, "K0001", "line1\nline2\r\nline3"),
        ("K=1", 2, "K0002", None),
    ]
    df = spark.createDataFrame(
        rows, "coll string, ord int, rkts string, tib string"
    )
    item = F.concat(
        F.lit("<item>"),
        xml_opt_tag("rkts", xml_escape_col(F.col("rkts"))),
        xml_opt_tag("tib", xml_escape_col(F.col("tib"))),
        F.lit("</item>"),
    )
    out = str(tmp_path / "xml_nl")
    paths = write_xml_outline(df, "coll", item, ["ord"], out)
    assert set(paths) == {"K=1"}
    items = ET.parse(paths["K=1"]).getroot().findall("item")
    assert items[0].find("tib").text == "line1\nline2\r\nline3"
    assert items[1].find("tib") is None  # null field -> tag omitted
    assert items[1].find("rkts").text == "K0002"

    # a null fragment (concat over a null without xml_opt_tag) must
    # fail loud, not silently corrupt the export
    bad = F.concat(
        F.lit("<item><tib>"), F.col("tib"), F.lit("</tib></item>")
    )
    import pytest

    with pytest.raises(SparkRuntimeException, match="null fragment"):
        write_xml_outline(
            df, "coll", bad, ["ord"], str(tmp_path / "xml_bad")
        )
