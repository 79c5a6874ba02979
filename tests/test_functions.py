"""Unit tests: column-expression functions vs the pure-Python contract
(vocab.py) — golden pairs from FIXTURES.md §9."""

from __future__ import annotations

from pyspark.sql import functions as F

from rkts_migration_spark import vocab as V
from rkts_migration_spark.functions.ids import (
    conv_iri_col,
    entity_iri_col,
    int_lit_col,
    pad_id_col,
    section_iri_col,
    turn_iri_col,
)
from rkts_migration_spark.functions.text import (
    _add_shad_one,
    nt_escape_col,
    nt_line_col,
    norm_label_col,
    norm_surface_col,
    str_lit_col,
)


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_pad_id_matches_python(spark):
    cases = ["E12", "12a", "7a", "E1234", "E12345", "noDigits", "12", "E3b7"]
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = {r["raw"]: r["padded"] for r in
           df.select("raw", pad_id_col(F.col("raw")).alias("padded")).collect()}
    for c in cases:
        assert got[c] == V.pad_id(c), c
    # golden pairs from /root/reference/utils.php:26-37 semantics
    assert got["12a"] == "0012a"
    assert got["E12"] == "E0012"


def test_iri_minting_matches_python(spark):
    df = spark.createDataFrame([("C000001", 7, 3)], "conv string, turn int, k int")
    row = df.select(
        conv_iri_col(F.col("conv")).alias("c"),
        turn_iri_col(F.col("conv"), F.col("turn")).alias("t"),
        section_iri_col(F.col("conv"), F.col("k")).alias("s"),
        int_lit_col(F.col("turn")).alias("i"),
    ).collect()[0]
    assert row["c"] == V.conv_iri("C000001")
    assert row["t"] == V.turn_iri("C000001", 7)
    assert row["s"] == V.section_iri("C000001", 3)
    assert row["i"] == V.int_lit(7)


def test_entity_iri_abstract_override(spark):
    df = spark.createDataFrame(
        [("E12", "WA0012"), ("E7", None)], "canon string, abs string"
    )
    got = {r["canon"]: r["iri"] for r in df.select(
        "canon", entity_iri_col(F.col("canon"), F.col("abs")).alias("iri")
    ).collect()}
    assert got["E12"] == V.ABSTRACT + "WA0012" == V.entity_iri("E12", "WA0012")
    assert got["E7"] == V.ENTITY + "E0007" == V.entity_iri("E7", None)


def test_nt_escape_parity(spark):
    cases = [
        'plain', 'quo"te', "back\\slash", "tab\there", "new\nline",
        "cr\rhere", "ctl\x01x", 'mix"\\\n\t\x02',
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["e"] for r in
           df.select(nt_escape_col(F.col("s")).alias("e")).collect()]
    for c, g in zip(cases, got):
        assert g == V.nt_escape(c), repr(c)
    # byte-precise expectations (Nquads.php:97-124 table)
    assert V.nt_escape('quo"te') == 'quo\\"te'
    assert V.nt_escape("ctl\x01x") == "ctl\\u0001x"


def test_str_lit_and_line(spark):
    lit = _one(spark.createDataFrame([("hi\nthere",)], "s string"),
               str_lit_col(F.col("s"), "en"))
    assert lit == V.str_lit("hi\nthere", "en") == '"hi\\nthere"@en'
    line_df = spark.createDataFrame(
        [("http://s", "http://p", "http://o"), ("http://s", "http://p", '"x"@en')],
        "subj string, pred string, obj string",
    )
    lines = [r["l"] for r in line_df.select(
        nt_line_col(F.col("subj"), F.col("pred"), F.col("obj")).alias("l")
    ).collect()]
    assert lines[0] == "<http://s> <http://p> <http://o> ."
    assert lines[1] == '<http://s> <http://p> "x"@en .'


def test_normalizers(spark):
    df = spark.createDataFrame([("  Spark   SQL\tmix ",)], "s string")
    assert _one(df, norm_surface_col(F.col("s"))) == V.norm_surface("  Spark   SQL\tmix ")
    df2 = spark.createDataFrame([("Sort-Merge Join",)], "s string")
    assert _one(df2, norm_label_col(F.col("s"))) == V.norm_label("Sort-Merge Join")


def test_add_shad_truth_table():
    # exact parity with /root/reference/utils.php:785-800 (probe cases
    # at utils.php:795-802, expected values hand-traced from the rules)
    assert _add_shad_one("a ga") == "a ga"        # a-strip -> g -> unchanged
    assert _add_shad_one("a sho") == "a sho"      # s·h exemption
    assert _add_shad_one("a ki") == "a ki"        # i-strip -> k
    assert _add_shad_one("a gu") == "a gu/"       # 'u' NOT stripped -> '/'
    assert _add_shad_one("a nga") == "a nga /"    # n·g -> ' /'
    assert _add_shad_one("a ngu") == "a ngu/"     # 'u' not stripped -> '/'
    assert _add_shad_one("a ngi") == "a ngi /"
    assert _add_shad_one("a tsho") == "a tsho/"   # t·s·h excluded from s·h
    assert _add_shad_one("bam po") == "bam po/"
    assert _add_shad_one("x1") == "x1"            # non-letter end
    assert _add_shad_one("g") == "g"              # len < 2 guard


def test_ref_string_functions(spark):
    """F3/F4/F12/F18 golden pairs (utils.php:17-56,406-410;
    editionxmltottl.php:236-241)."""
    from rkts_migration_spark.functions.ids import (
        eid_to_wlname_col,
        rdf_ci_to_url_col,
    )
    from rkts_migration_spark.functions.text import (
        catalogue_index_to_rdf_col,
        chapter_title_clean_col,
    )

    df = spark.range(1)
    # F3: leading digits padded to 4, suffix uppercased
    for raw, want in [("7a", "0007A"), ("12", "0012"), ("12345", "12345"),
                      ("302a5", "0302A5"), ("abc", "0000ABC")]:
        assert _one(df, rdf_ci_to_url_col(F.lit(raw))) == want, raw
    # F4: EID strip + punctuation translate
    for raw, want in [("EIDD12(3.4)", "D12-3-4"), ("EIDD9?x,y", "D9_x-y")]:
        assert _one(df, catalogue_index_to_rdf_col(F.lit(raw), 3)) == want, raw
    # F12
    assert _one(df, eid_to_wlname_col(F.lit("MW22084"))) == "W22084"
    assert _one(df, eid_to_wlname_col(F.lit("MW1BL6"))) == "W1ER156"
    # F18: ". " within first 5 chars strips the ordinal
    for raw, want in [("1. intro", "intro"), ("1234. x", "x"),
                      ("chapter. none", "chapter. none"), ("no dot", "no dot")]:
        assert _one(df, chapter_title_clean_col(F.lit(raw))) == want, raw


def test_comparepg_matches_reference(spark):
    """F16 truth table mirroring migrate-bvm.py:58-76 comparepg."""
    import re

    from rkts_migration_spark.functions.text import comparepg_col

    PG_RE = re.compile(
        r"^(?P<folionum>x|\d+)(?P<duplind>'*)(?P<side>[ab])"
        r"(?P<certaintyind>\??)(?P<detailind>\(d\d*\))?")

    def ref_comparepg(pg1, pg2):  # transcribed semantics, not code
        if pg1 == pg2:
            return 0
        m1, m2 = PG_RE.match(pg1), PG_RE.match(pg2)
        if m1 is None or m2 is None:
            return 0
        if m1.group("folionum") == "x" or m2.group("folionum") == "x":
            return 0
        fd = int(m1.group("folionum")) - int(m2.group("folionum"))
        if fd:
            return fd
        dc = (m1.group("duplind") > m2.group("duplind")) - (
            m1.group("duplind") < m2.group("duplind"))
        if dc:
            return dc
        return (m1.group("side") > m2.group("side")) - (
            m1.group("side") < m2.group("side"))

    cases = [
        ("1a", "1b"), ("1b", "1a"), ("2a", "10a"), ("10a", "2a"),
        ("3a", "3a"), ("3'a", "3a"), ("3a", "3'a"), ("3''b", "3'b"),
        ("xa", "5b"), ("5b", "xa"), ("1a?", "1b"), ("bogus", "1a"),
        ("12a(d3)", "12b"),
    ]
    df = spark.range(1)
    for a, b in cases:
        got = _one(df, comparepg_col(F.lit(a), F.lit(b)))
        want = ref_comparepg(a, b)
        sign = (want > 0) - (want < 0)
        assert got == sign, (a, b, got, want)


def test_rdf_ci_to_url_leading_zeros(spark):
    # parity with sprintf("%04d", intval(...)) in rdf_ci_to_url
    # (/root/reference/utils.php:45-56): intval STRIPS leading zeros
    # before the %04d pad.
    from rkts_migration_spark.functions.ids import rdf_ci_to_url_col

    cases = {
        "00123": "0123",     # intval-strip then pad (NOT '00123')
        "0012a": "0012A",
        "000": "0000",
        "0": "0000",
        "12345": "12345",
        "7a": "0007A",
        "abc": "0000ABC",    # no leading digits -> %04d of 0
        "00012345": "12345",
    }
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = {r["raw"]: r["out"] for r in
           df.select("raw", rdf_ci_to_url_col(F.col("raw")).alias("out")).collect()}
    assert got == cases


def test_location_grammar_tail():
    # the reference's embedded REPL cases (utils.php:748-752) plus the
    # ?-strip / pattern_vol / pattern_loc_simple corners, against the
    # pure-Python parser the pandas UDF wraps.
    from rkts_migration_spark.functions.locations import _parse_one

    r = _parse_one("'dul ba, ka 1b1-nga 302a5 (vol. 1-4)", "full")
    assert (r["section"], r["bvolname"], r["evolname"]) == ("'dul ba", "ka", "nga")
    assert (r["bpagenum"], r["bpageside"], r["blinenum"]) == (1, "b", 1)
    assert (r["epagenum"], r["epageside"], r["elinenum"]) == (302, "a", 5)
    assert (r["bvolnum"], r["evolnum"], r["valid"]) == (1, 4, True)

    # 'wam' is not whitelisted (waM is) -> warn channel, fields parsed
    r = _parse_one("gzugs, wam 245a4-247a7 (vol. 102)", "full")
    assert r["valid"] is False and "wam" in r["error"]
    assert (r["bpagenum"], r["epagenum"], r["bvolnum"]) == (245, 247, 102)

    r = _parse_one("ga 107a7-116a5", "bampo")
    assert (r["bvolname"], r["bpagenum"], r["epagenum"]) == ("ga", 107, 116)

    # pattern_vol (utils.php:567)
    r = _parse_one("'dul ba, ka", "vol")
    assert (r["section"], r["bvolname"], r["valid"]) == ("'dul ba", "ka", True)
    r = _parse_one("chos mngon pa", "vol")
    assert (r["section"], r["bvolname"], r["valid"]) == ("chos mngon pa", None, True)

    # pagerange ?-strip (utils.php:611-616): '?' end -> open range
    r = _parse_one("12a3?-?", "pagerange")
    assert (r["bpagenum"], r["bpageside"], r["blinenum"]) == (12, "a", 3)
    assert r["epagenum"] is None and r["valid"] is True

    # pattern_loc_simple (utils.php:571), optional space after comma
    for s in ("3.417?, - 4.421", "3.417?,- 4.421"):
        r = _parse_one(s, "simple_range")
        assert (r["bvolnum"], r["bpagenum"], r["evolnum"], r["epagenum"]) == \
            (3, 417, 4, 421)


def test_chapter_title_clean_divergence_decision(spark):
    # DECISION RECORD (vs /root/reference/editionxmltottl.php:236-241):
    # PHP's strpos returns false (-> 0) when '. ' is absent, so the
    # reference silently drops the first 2 chars of any title WITHOUT
    # a '. ' separator. That is a bug we deliberately do NOT
    # reproduce: such titles pass through UNCHANGED here. This test
    # pins the intended difference so parity sweeps don't flag it.
    from rkts_migration_spark.functions.text import chapter_title_clean_col

    cases = {
        "1. intro": "intro",          # ordinal stripped (both engines)
        "1234. x": "x",               # '. ' within first 5 chars
        "chapter. none": "chapter. none",  # '. ' too late -> unchanged
        "no dot": "no dot",           # reference would emit ' dot'
        "ab": "ab",                   # reference would emit ''
    }
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = {r["raw"]: r["out"] for r in df.select(
        "raw", chapter_title_clean_col(F.col("raw")).alias("out")).collect()}
    assert got == cases


def test_xml_escape_parity(spark):
    """xml_escape_col vs xml.sax.saxutils.escape (the reference's
    escaper, sqltoxml.py:2,147) over adversarial inputs: entity-like
    text must double-escape, & must be escaped exactly once."""
    from xml.sax.saxutils import escape

    from rkts_migration_spark.functions.text import xml_escape_col

    cases = [
        "plain", "a & b", "<tag>", "a<b>c&d", "&amp;", "&lt;already&gt;",
        "&&&", "<<>>", "", "unicode ༄ stays", 'quote " untouched',
        "mix &<>\n\ttail",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["e"] for r in
           df.select(xml_escape_col(F.col("s")).alias("e")).collect()]
    for c, g in zip(cases, got):
        assert g == escape(c), repr(c)
    # the order-of-operations trap: pre-escaped text escapes AGAIN
    assert escape("&amp;") == "&amp;amp;"
