"""Text/literal column expressions + the few pandas UDFs.

nt_escape_col is a pure-JVM chain with byte-precise parity to the
reference serializer (/root/reference/Nquads.php:97-124): backslash
first (so later escapes aren't double-escaped), then quote/tab/nl/cr,
then every remaining C0 control char to its fixed \\uXXXX form.
Chained regexp_replace stays inside whole-stage codegen — no Python
at execution time on the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# C0 control chars that get \uXXXX (everything < 0x20 except \t \n \r)
_CTL = [o for o in range(0x20) if o not in (0x09, 0x0A, 0x0D)]


def nt_escape_col(c: Column) -> Column:
    """Guarded escape: one rlike scan decides whether any escaping is
    needed at all; the 34-replace chain only runs on the (rare) rows
    that contain a quote/backslash/control char. Codegen compiles the
    WHEN into a branch, so clean strings cost exactly one regex scan
    instead of 34 — this is the difference between the N-Triples
    formatter being free and being the pipeline's hottest operator."""
    needs = c.rlike('[\\x00-\\x1F"\\\\]')
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\t", "\\\\t")
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    for o in _CTL:
        out = F.regexp_replace(out, f"\\x{o:02x}", f"\\\\u{o:04X}")
    return F.when(needs, out).otherwise(c)


def xml_escape_col(c: Column) -> Column:
    """XML text-content escaping with byte parity to
    ``xml.sax.saxutils.escape`` (the reference's escaper,
    /root/reference/sqltoxml.py:2,147): ``&`` first so the entities
    introduced by ``<``/``>`` are not double-escaped. Literal
    ``F.replace`` (no regex) — stays inside whole-stage codegen."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def str_lit_col(c: Column, lang) -> Column:
    """N-Triples language-tagged literal; ``lang`` is a Column or str."""
    lang_col = lang if isinstance(lang, Column) else F.lit(lang)
    return F.concat(F.lit('"'), nt_escape_col(c), F.lit('"@'), lang_col)


def nt_line_col(subj: Column, pred: Column, obj: Column) -> Column:
    """One N-Triples line. Objects are stored pre-rendered (IRIs bare,
    literals already quoted/escaped), so only IRIs get <> here.
    Parity: /root/reference/Nquads.php:149-200."""
    obj_rendered = F.when(
        obj.startswith("http://") | obj.startswith("https://"),
        F.concat(F.lit("<"), obj, F.lit(">")),
    ).otherwise(obj)
    return F.format_string("<%s> <%s> %s .", subj, pred, obj_rendered)


def norm_surface_col(c: Column) -> Column:
    """Match-key normalization: lowercase + collapse/trim whitespace.
    Must agree with vocab.norm_surface."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def norm_label_col(c: Column) -> Column:
    """Label-dedup normalization: lowercase, strip spaces and hyphens
    (parity with /root/reference/kernelxmltottl.php:208-211)."""
    return F.translate(F.lower(c), " -", "")


def catalogue_index_to_rdf_col(c: Column, eid_len: int) -> Column:
    """F4 (catalogue_index_xml_to_rdf, /root/reference/utils.php:17-24):
    strip the edition-id prefix, then '(', '.', ',' -> '-', ')' -> '',
    '?' -> '_'. translate deletes chars whose target is absent."""
    stripped = F.substring(c, eid_len + 1, 1_000_000)
    return F.translate(stripped, "(.,?)", "---_")


def chapter_title_clean_col(c: Column) -> Column:
    """F18 (/root/reference/editionxmltottl.php:236-241): strip a
    leading "N. " ordinal when the ". " occurs within the first 5
    chars. (The reference's PHP treats a MISSING ". " as position 0
    and silently drops 2 chars — an strpos-false bug we do not
    reproduce; titles without ". " pass through unchanged.)"""
    pos = F.instr(c, ". ")
    return F.when((pos >= 1) & (pos <= 5), F.substr(c, pos + F.lit(2))).otherwise(c)


# F16 comparepg (/root/reference/migrate-bvm.py:14,58-76): pagination
# strings "<folio|x><'' dupl ticks><a|b>[?][(dN)]" compare by
# (folio, ticks, side); 'x' or unparsable compares equal to anything.
_PG_PATTERN = r"^(x|\d+)('*)([ab])(\??)(\(d\d*\))?"


def pagination_parts(c: Column) -> tuple[Column, Column, Column, Column]:
    """(valid, folio_int, tick_count, side) for a pagination string."""
    folio = F.regexp_extract(c, _PG_PATTERN, 1)
    ticks = F.length(F.regexp_extract(c, _PG_PATTERN, 2))
    side = F.regexp_extract(c, _PG_PATTERN, 3)
    valid = (folio != "") & (folio != "x")
    return valid, folio.cast("int"), ticks, side


def comparepg_col(a: Column, b: Column) -> Column:
    """Sign of comparepg(a, b): folio diff, then dupl-tick count, then
    side; equal strings, 'x' folios and unparsable inputs -> 0."""
    av, af, at, asd = pagination_parts(a)
    bv, bf, bt, bsd = pagination_parts(b)
    side_cmp = F.when(asd > bsd, 1).when(asd < bsd, -1).otherwise(0)
    tick_cmp = F.when(at > bt, 1).when(at < bt, -1).otherwise(side_cmp)
    folio_cmp = F.when(af > bf, 1).when(af < bf, -1).otherwise(tick_cmp)
    return (
        F.when(a == b, 0)
        .when(~av | ~bv, 0)
        .otherwise(folio_cmp)
    )


# --- pandas UDFs (procedural, Arrow-batched) --------------------------------

def _add_shad_one(s: str) -> str:
    """EWTS shad-appending, exact parity with add_shad
    (/root/reference/utils.php:785-800): consider the final char, or the
    one before it when the final is a/i/e/o (NOT u); 'n'+'g' -> ' /';
    g/k or s·h (except t·s·h) -> unchanged; non-ASCII-letter ->
    unchanged; else '/'. Positional checks index the ORIGINAL string.
    """
    n = len(s)
    if n < 2:
        return s
    last = s[-1]
    if last in "aieo":
        last = s[-2]
    if n > 2 and last == "g" and s[-3] == "n":
        return s + " /"
    if (
        last in ("g", "k")
        or (n == 3 and last == "h" and s[-3] == "s")
        or (n > 3 and last == "h" and s[-3] == "s" and s[-4] != "t")
    ):
        return s
    if not ("A" <= last <= "Z" or "a" <= last <= "z"):
        return s
    return s + "/"


@F.pandas_udf(T.StringType())
def add_shad(s: pd.Series) -> pd.Series:
    return s.map(lambda x: _add_shad_one(x) if x is not None else None)


# Exact-parity constants from guess_lt (/root/reference/migrate-bvm.py:27-53):
# IAST diacritic set and first-match-wins native ranges (bounds are
# EXCLUSIVE in the reference; the duplicate 0x0900 zh-Hani entry never
# fires because sa-Deva precedes it).
_IAST_CHARS = "ṀṃṂāĀīĪūŪṛṚṝṜḷḶḹḸḥḤṅṄñÑṭṬḍḌṇṆśŚṣṢḻḺ"
_NATIVE_RANGES = [
    (0x0900, 0x097F, "sa-Deva"),
    (0x0F00, 0x0FFF, "bo"),
    (0x0400, 0x045F, "ru"),
    (0x2E80, 0x2EFF, "zh-Hani"),
    (0x3000, 0x303F, "zh-Hani"),
    (0x3200, 0x9FFF, "zh-Hani"),
    (0xF900, 0xFAFF, "zh-Hani"),
    (0x20000, 0x2CEAF, "zh-Hani"),
]


def _guess_lang_one(s: str, default: str = "en") -> str:
    """Heuristic language guess, exact parity with guess_lt
    (/root/reference/migrate-bvm.py:27-53; tests/test_reference_parity.py
    checks against the reference function itself): trailing '/' ->
    bo-x-ewts; IAST diacritics -> sa-x-iast; first-char native range
    (exclusive bounds, first match) -> sa-Deva/bo/ru/zh-Hani; else
    default. Empty input returns default (the reference assumes
    non-empty)."""
    if not s:
        return default
    if s.endswith("/"):
        return "bo-x-ewts"
    if any(c in s for c in _IAST_CHARS):
        return "sa-x-iast"
    o = ord(s[0])
    for lo, hi, lt in _NATIVE_RANGES:
        if lo < o < hi:
            return lt
    return default


@F.pandas_udf(T.StringType())
def guess_lang(s: pd.Series) -> pd.Series:
    return s.map(lambda x: _guess_lang_one(x) if x is not None else "en")

