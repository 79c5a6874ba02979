"""Deterministic IRI-minting column expressions.

Pure Catalyst expressions (no Python at execution time) so re-runs and
speculative task retries are idempotent — the scale-safety property
SURVEY.md §4.4 requires. Parity targets:
- pad_id_col      ~ id_to_str      /root/reference/utils.php:26-37
- section_iri_col ~ bnode_url      /root/reference/utils.php:7-15
- entity_iri_col  ~ abstract/template minting /root/reference/utils.php:68-97
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import vocab as V


def pad_id_col(c: Column, width: int = 4) -> Column:
    """Zero-pad the first digit-run to ``width`` ("E12"->"E0012",
    "12a"->"0012a" at the default 4); ids without digits pass through
    unchanged. width=19 covers the full non-negative int64 range for
    internal order-safe encodings."""
    prefix = F.regexp_extract(c, r"^([^0-9]*)([0-9]+)(.*)$", 1)
    digits = F.regexp_extract(c, r"^([^0-9]*)([0-9]+)(.*)$", 2)
    suffix = F.regexp_extract(c, r"^([^0-9]*)([0-9]+)(.*)$", 3)
    # NB: lpad TRUNCATES beyond the target length; zfill semantics keep
    # longer digit runs intact, so guard on length.
    padded = F.when(
        F.length(digits) >= width, digits
    ).otherwise(F.lpad(digits, width, "0"))
    return F.when(digits == "", c).otherwise(F.concat(prefix, padded, suffix))


def zpad_col(c: Column, width: int) -> Column:
    """%0<width>d for a non-negative integral column via concat/lpad —
    format_string goes through java.util.Formatter (slow, allocation-
    heavy); lpad stays in UTF8String. Guard keeps >width digit runs
    intact (lpad truncates, Formatter does not)."""
    s = c.cast("string")
    return F.when(F.length(s) >= width, s).otherwise(F.lpad(s, width, "0"))


def conv_iri_col(conv_id: Column) -> Column:
    return F.concat(F.lit(V.CONV), conv_id)


def turn_iri_col(conv_id: Column, turn_idx: Column) -> Column:
    return F.concat(
        F.lit(V.CONV), conv_id, F.lit("/turn/"), zpad_col(turn_idx, 4)
    )


def section_iri_col(conv_id: Column, k: Column) -> Column:
    """sha256-facet node: upper(sha256(conv#k)[:6]) + '_' + %02d."""
    h = F.upper(
        F.substring(
            F.sha2(F.concat(conv_id, F.lit("#"), k.cast("string")), 256), 1, 6
        )
    )
    return F.concat(
        F.lit(V.CONV), conv_id, F.lit("/section/"), h, F.lit("_"), zpad_col(k, 2)
    )


def entity_iri_col(canonical_id: Column, abstract_local: Column) -> Column:
    """Abstract-map override else template-minted zero-padded IRI."""
    return F.when(
        abstract_local.isNotNull(), F.concat(F.lit(V.ABSTRACT), abstract_local)
    ).otherwise(F.concat(F.lit(V.ENTITY), pad_id_col(canonical_id)))


def rdf_ci_to_url_col(c: Column) -> Column:
    """F3 (rdf_ci_to_url, /root/reference/utils.php:45-56): intval the
    LEADING digit run, %04d-pad it, uppercase the remainder
    ("7a"->"0007A", "12345"->"12345", no leading digits ->
    "0000"+upper(id)). The intval step strips leading zeros —
    "00123" -> 123 -> "0123" (NOT "00123"); a digit run of all zeros
    collapses to "0000". Parity with sprintf("%04d", intval(...))."""
    digits = F.regexp_extract(c, r"^([0-9]*)", 1)
    rest = F.substr(c, F.length(digits) + F.lit(1))
    stripped = F.regexp_replace(digits, r"^0+", "")
    padded = F.when(F.length(stripped) >= 4, stripped).otherwise(
        F.lpad(stripped, 4, "0")
    )
    return F.concat(padded, F.upper(rest))


def eid_to_wlname_col(c: Column) -> Column:
    """F12 (eid_to_wlname, /root/reference/utils.php:406-410):
    "MW..."->"W..." with the single special case MW1BL6->W1ER156."""
    return F.when(c == "MW1BL6", F.lit("W1ER156")).otherwise(
        F.substr(c, F.lit(2))
    )


def int_lit_col(c: Column) -> Column:
    return F.concat(
        F.lit('"'), c.cast("string"), F.lit('"^^<' + V.XSD_INT + ">")
    )
