"""Location-grammar parsing (F9), volume-letter validation (F10) and
folio->image-number arithmetic (F11).

Grammar semantics from /root/reference/utils.php:564-746 (regexes at
utils.php:564-572, page-line split at utils.php:691-723, chemdo simple
numeric grammar at utils.php:648-658, folio arithmetic at
utils.php:390-403). Re-expressed as:
- one vectorized pandas UDF (`parse_location`) returning a struct —
  procedural named-group logic stays in Python, Arrow-batched;
- a pure column expression for folio arithmetic (JVM-side);
- validation failures become an error-channel DataFrame (the
  distributed analog of report_error, utils.php:558-560), not prints.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# "'dul ba, ka 1b1-nga 302a5 (vol. 1-4)": section, begin/end volume
# letter, folio+side+line, optional volume-number range
_LOC = re.compile(
    r"^(?P<section>[^,]+)(?:, (?P<bvolname>[^ ]+))? (?P<bpageline>[0-9ab]+)\??"
    r"(?:\-(?:(?P<evolname>[^ ]+) )?(?P<epageline>[0-9ab]+))?\??"
    r"(?: \(vol\. (?P<bvolnum>\d+)(?:\-(?P<evolnum>\d+))?)?"
)
# "107a7": folio number, a/b side, optional line
_SMALL = re.compile(r"(?P<pagenum>\d+)(?P<ab>[ab])(?P<linenum>\d+)?\??")
# bampo/chapter variant without section: "ga 107a7-116a5"
_BAMPO = re.compile(
    r"^(?:(?P<bvolname>[^ ]+) )?(?P<bpageline>[0-9ab]+)"
    r"(?:\-(?:(?P<evolname>[^ ]+) )?(?P<epageline>[0-9ab]+))?$"
)
# chemdo catalogs use plain numeric page ranges: "417-421"
_SIMPLE_SMALL = re.compile(r"^(?P<bpagenum>\d+)-(?P<epagenum>\d+)$")
# standalone volume spec "('dul ba, ka)" — pattern_vol, utils.php:567
_VOL = re.compile(r"^(?P<section>[^,]+)(?:, (?P<bvolname>.*))?$")
# structured-loc page range "1b1?-302a5" / "12a3?-?" with trailing-?
# stripping — pattern_pagerange_simple + utils.php:611-616
_PAGERANGE = re.compile(
    r"^(?P<bpageline>[0-9ab]+)\??-(?P<epageline>[0-9ab]+|\?)$")
# "3.417?, - 4.421" volume.page ranges — pattern_loc_simple, utils.php:571
_SIMPLE_RANGE = re.compile(
    r"^(?P<bvolnum>\d+)\.(?P<bpagenum>\d+)\?, ?- ?(?P<evolnum>\d+)\.(?P<epagenum>\d+)$"
)

# EWTS volume-letter whitelist (utils.php:562); validation failures go
# to the error channel, rows still parse (reference behavior: warn).
ALLOWED_VOL_LETTERS = frozenset(
    """ka kha ga nga ca cha ja nya ta tha da na pa pha ba ma a wa za zha
    'a dza tsha tsa ya ra sha ha aM aH e waM sa la shrI ki khi gi ngi ci
    chi ji nyi ti thi di ni pi phi bi mi tsi tshi dzi wi zhi zi 'i yi ri
    li shi si i ku khu gu ngu cu chu ju nyu tu thu du nu pu phu bu mu
    tsu tshu hi dzu wu zhu 'u ru lu shu su hu u ke ge nge ce che je te
    de pe phe tshe dze we zhe ze ye re le she se he ko ngo co jo nyo to
    tho no po zu yu A khe nye the ne tse 'e kho go cho do pho bo mo
    oM""".split()
)

LOC_STRUCT = T.StructType([
    T.StructField("section", T.StringType()),
    T.StructField("bvolname", T.StringType()),
    T.StructField("evolname", T.StringType()),
    T.StructField("bpagenum", T.IntegerType()),
    T.StructField("bpageside", T.StringType()),
    T.StructField("blinenum", T.IntegerType()),
    T.StructField("epagenum", T.IntegerType()),
    T.StructField("epageside", T.StringType()),
    T.StructField("elinenum", T.IntegerType()),
    T.StructField("bvolnum", T.IntegerType()),
    T.StructField("evolnum", T.IntegerType()),
    T.StructField("valid", T.BooleanType()),
    T.StructField("error", T.StringType()),
])


def _parse_one(s: str | None, grammar: str) -> dict:
    out: dict = {k.name: None for k in LOC_STRUCT.fields}
    out["valid"] = False
    if not s:
        out["error"] = "empty"
        return out
    if grammar == "simple":  # chemdo numeric grammar
        m = _SIMPLE_SMALL.match(s)
        if not m:
            out["error"] = f"invalid_loc: {s!r}"
            return out
        out["bpagenum"] = int(m.group("bpagenum"))
        out["epagenum"] = int(m.group("epagenum"))
        out["valid"] = True
        return out
    if grammar == "vol":  # pattern_vol (utils.php:567): "section, letter"
        m = _VOL.match(s)
        if not m:
            out["error"] = f"invalid_loc: {s!r}"
            return out
        out["section"] = m.group("section")
        out["bvolname"] = m.group("bvolname")
        v = out["bvolname"]
        if v and v not in ALLOWED_VOL_LETTERS:
            out["error"] = f"invalid_volume_letter: {v!r}"
        else:
            out["valid"] = True
        return out
    if grammar == "pagerange":
        # pattern_pagerange_simple + the trailing-? strip of
        # utils.php:611-616: epageline may be a bare '?' which strips
        # to empty (open-ended range -> no end fields)
        m = _PAGERANGE.match(s)
        if not m:
            out["error"] = f"invalid_loc: {s!r}"
            return out
        errs = []
        for side, key in (("b", "bpageline"), ("e", "epageline")):
            pl = m.group(key) or ""
            if pl.endswith("?"):
                pl = pl[:-1]
            if not pl:
                continue
            sm = _SMALL.match(pl)
            if not sm:
                errs.append(f"invalid_pageline: {pl!r}")
                continue
            out[f"{side}pagenum"] = int(sm.group("pagenum"))
            out[f"{side}pageside"] = sm.group("ab")
            if sm.group("linenum"):
                out[f"{side}linenum"] = int(sm.group("linenum"))
        out["valid"] = not errs
        out["error"] = "; ".join(errs) if errs else None
        return out
    if grammar == "simple_range":  # pattern_loc_simple (utils.php:571)
        m = _SIMPLE_RANGE.match(s)
        if not m:
            out["error"] = f"invalid_loc: {s!r}"
            return out
        out["bvolnum"] = int(m.group("bvolnum"))
        out["bpagenum"] = int(m.group("bpagenum"))
        out["evolnum"] = int(m.group("evolnum"))
        out["epagenum"] = int(m.group("epagenum"))
        out["valid"] = True
        return out
    rx = _BAMPO if grammar == "bampo" else _LOC
    m = rx.match(s)
    if not m:
        out["error"] = f"invalid_loc: {s!r}"
        return out
    g = m.groupdict()
    out["section"] = g.get("section")
    out["bvolname"] = g.get("bvolname")
    out["evolname"] = g.get("evolname")
    out["bvolnum"] = int(g["bvolnum"]) if g.get("bvolnum") else None
    out["evolnum"] = int(g["evolnum"]) if g.get("evolnum") else None
    errs = []
    for side, key in (("b", "bpageline"), ("e", "epageline")):
        pl = g.get(key)
        if not pl:
            continue
        sm = _SMALL.match(pl)
        if not sm:
            errs.append(f"invalid_pageline: {pl!r}")
            continue
        out[f"{side}pagenum"] = int(sm.group("pagenum"))
        out[f"{side}pageside"] = sm.group("ab")
        if sm.group("linenum"):
            out[f"{side}linenum"] = int(sm.group("linenum"))
    for key in ("bvolname", "evolname"):
        v = out[key]
        if v and v not in ALLOWED_VOL_LETTERS:
            errs.append(f"invalid_volume_letter: {v!r}")
    out["valid"] = not errs
    out["error"] = "; ".join(errs) if errs else None
    return out


def make_parse_location_udf(grammar: str = "full"):
    """grammar: 'full' (text loc), 'bampo' (chapter/bampo loc),
    'simple' (chemdo numeric), 'vol' (pattern_vol volume spec),
    'pagerange' (structured-loc page range with ?-strip) or
    'simple_range' (volume.page range). Returns a pandas UDF ->
    LOC_STRUCT."""

    @F.pandas_udf(LOC_STRUCT)
    def parse_location(s: pd.Series) -> pd.DataFrame:
        rows = [_parse_one(x, grammar) for x in s]
        return pd.DataFrame(rows, columns=[f.name for f in LOC_STRUCT.fields])

    return parse_location


@F.pandas_udf(LOC_STRUCT)
def parse_location_any(grammar: pd.Series, s: pd.Series) -> pd.DataFrame:
    """Two-arg variant: per-row grammar selection, for corpora mixing
    full/bampo/simple/vol/pagerange/simple_range location kinds (the
    reference picks the regex per file kind, utils.php:648-680)."""
    rows = [_parse_one(x, g) for g, x in zip(grammar, s)]
    return pd.DataFrame(rows, columns=[f.name for f in LOC_STRUCT.fields])


def location_errors(df: DataFrame, loc_col: str = "loc") -> DataFrame:
    """Error-channel rows (report_error analog): one row per invalid
    location, kept as data for the run's metrics table."""
    return df.filter(~F.col(f"{loc_col}.valid")).select(
        "*", F.col(f"{loc_col}.error").alias("loc_error")
    )


def folio_side_to_pagenum(
    folio: Column, side: Column, first_folio_page: Column
) -> Column:
    """Arithmetic image-number path (utils.php:390-403):
    2*(folio-1) + first_folio_page + (side == 'b'). Per-volume
    overrides are broadcast-joined by callers and passed as
    ``first_folio_page``."""
    return (
        (folio - 1) * 2 + first_folio_page + F.when(side == "b", 1).otherwise(0)
    ).cast("int")
