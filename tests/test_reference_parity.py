"""GENUINE reference parity: load the reference's own Python
functions (guess_lt / guessFromRange / comparepg / strcmp and their
constants) from /root/reference/migrate-bvm.py via AST extraction —
no copying, no side effects (only the selected pure defs are
compiled; the module's boto3/S3 top-level code is never executed) —
and compare our implementations against them on generated inputs.

This upgrades F15/F16 from transcription-parity to
runs-the-actual-reference parity (PHP functions can't run here; the
Python ones can)."""

from __future__ import annotations

import ast
import re

import pytest

REFERENCE = "/root/reference/migrate-bvm.py"

_WANT_FUNCS = {"guessFromRange", "guess_lt", "strcmp", "comparepg"}
_WANT_ASSIGNS = {"PG_RE", "NATIVERANGES"}


@pytest.fixture(scope="module")
def ref():
    tree = ast.parse(open(REFERENCE).read())
    keep: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _WANT_FUNCS:
            keep.append(node)
        elif isinstance(node, ast.Assign):
            names = {t.id for t in node.targets if isinstance(t, ast.Name)}
            if names & _WANT_ASSIGNS:
                keep.append(node)
    ns: dict = {"re": re}
    exec(  # noqa: S102 — curated pure statements from the read-only reference
        compile(ast.Module(body=keep, type_ignores=[]), REFERENCE, "exec"), ns)
    assert _WANT_FUNCS <= set(ns), "reference functions not found"
    return ns


def test_guess_lang_matches_reference(ref):
    from rkts_migration_spark.functions.text import _guess_lang_one

    cases = [
        "hello", "bka' 'gyur/", "mdo sde /",  # ewts shad endings
        "ācārya", "Ṭīkā", "prajñā",           # IAST diacritics
        "अव", "ཀོ", "Ж", "中文",
        "あ", "⺅x", "豈", "a/", "/",
        "x", "Z", "9 pages", "ǂ", "ॾ",
    ]
    for s in cases:
        assert _guess_lang_one(s) == ref["guess_lt"](s), repr(s)


def test_guess_lang_matches_reference_exhaustive_first_chars(ref):
    """Sweep the BMP in steps so every range boundary is exercised."""
    from rkts_migration_spark.functions.text import _guess_lang_one

    for o in range(1, 0xFFFF, 7):
        s = chr(o) + "x"
        if s.endswith("/"):
            continue
        assert _guess_lang_one(s) == ref["guess_lt"](s), hex(o)


def test_comparepg_matches_reference_function(ref):
    from itertools import product

    from rkts_migration_spark.functions.text import comparepg_col
    from pyspark.sql import functions as F
    from rkts_migration_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    folios = ["x", "1", "2", "10", "007"]
    ticks = ["", "'", "''"]
    sides = ["a", "b"]
    certs = ["", "?"]
    details = ["", "(d2)"]
    pgs = ["".join(p) for p in product(folios, ticks, sides, certs, details)]
    pgs += ["bogus", "", "3c", "12"]
    pairs = [(a, b) for a in pgs for b in pgs if a and b][:4000]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["out"] for r in
        df.select(comparepg_col(F.col("a"), F.col("b")).alias("out")).collect()
    ]
    for (a, b), g in zip(pairs, got):
        want = ref["comparepg"](a, b)
        sign = (want > 0) - (want < 0)
        assert g == sign, (a, b, g, want)
