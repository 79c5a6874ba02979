"""Property-based tests (SURVEY.md §5.3): the column-expression
implementations must agree with the pure-Python contract (vocab.py /
reference-transcribed semantics) on arbitrary inputs, not just golden
pairs. Strategy values are collected per test and evaluated through
Spark in ONE batch (a per-example Spark roundtrip would be minutes)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rkts_migration_spark import vocab as V


def _batch(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in
            df.select(col_fn(F.col("v")).alias("out")).collect()]


ids = st.text(
    alphabet="ABEKTW0123456789abz?", min_size=0, max_size=12)


def test_pad_id_property(spark):
    from rkts_migration_spark.functions.ids import pad_id_col

    vals = []
    @settings(max_examples=300, deadline=None)
    @given(ids)
    def collect(s):
        vals.append(s)
    collect()
    got = _batch(spark, vals, pad_id_col)
    for v, g in zip(vals, got):
        assert g == V.pad_id(v), (v, g, V.pad_id(v))


texts = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
    min_size=0, max_size=40)


def test_nt_escape_property(spark):
    from rkts_migration_spark.functions.text import nt_escape_col

    vals = []
    @settings(max_examples=300, deadline=None)
    @given(texts)
    def collect(s):
        vals.append(s)
    collect()
    got = _batch(spark, vals, nt_escape_col)
    for v, g in zip(vals, got):
        assert g == V.nt_escape(v), (repr(v), repr(g), repr(V.nt_escape(v)))


_PG_RE = re.compile(
    r"^(?P<folionum>x|\d+)(?P<duplind>'*)(?P<side>[ab])"
    r"(?P<certaintyind>\??)(?P<detailind>\(d\d*\))?")


def _ref_comparepg(pg1: str, pg2: str) -> int:
    if pg1 == pg2:
        return 0
    m1, m2 = _PG_RE.match(pg1), _PG_RE.match(pg2)
    if m1 is None or m2 is None:
        return 0
    if m1.group("folionum") == "x" or m2.group("folionum") == "x":
        return 0
    fd = int(m1.group("folionum")) - int(m2.group("folionum"))
    if fd:
        return (fd > 0) - (fd < 0)
    for grp in ("duplind", "side"):
        c = (m1.group(grp) > m2.group(grp)) - (m1.group(grp) < m2.group(grp))
        if c:
            return c
    return 0


pgs = st.one_of(
    st.builds(
        lambda f, t, s, c: f"{f}{t}{s}{c}",
        st.one_of(st.just("x"), st.integers(0, 999).map(str)),
        st.sampled_from(["", "'", "''"]),
        st.sampled_from(["a", "b"]),
        st.sampled_from(["", "?"]),
    ),
    st.text(alphabet="0123456789abx'?", min_size=0, max_size=6),
)


def test_comparepg_property(spark):
    from rkts_migration_spark.functions.text import comparepg_col

    pairs = []
    @settings(max_examples=300, deadline=None)
    @given(pgs, pgs)
    def collect(a, b):
        pairs.append((a, b))
    collect()
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["out"]
        for r in df.select(
            comparepg_col(F.col("a"), F.col("b")).alias("out")).collect()
    ]
    for (a, b), g in zip(pairs, got):
        assert g == _ref_comparepg(a, b), (a, b, g, _ref_comparepg(a, b))


def test_add_shad_property(spark):
    from rkts_migration_spark.functions.text import _add_shad_one, add_shad

    vals = []
    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abceghiknorstuz' /", min_size=0, max_size=10))
    def collect(s):
        vals.append(s)
    collect()
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["out"] for r in df.select(add_shad(F.col("v")).alias("out")).collect()]
    for v, g in zip(vals, got):
        assert g == _add_shad_one(v), (v, g)
