"""Text-analysis operators for training-data pipelines: token stats,
quality gates, stopword-evidence language ID, fingerprints. All pure
column expressions (whole-stage codegen; no UDFs) — each has an
engine-mirrored oracle in queries.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "on")
STOPWORDS_ES = ("el", "la", "de", "que", "en", "los")

_LANG_EVIDENCE: dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "is"),
    "es": STOPWORDS_ES,
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


# GPT-2-style pre-tokenizer, restricted to constructs RE2 also supports
# (no lookarounds — the original's trailing `\s+(?!\S)` branch is
# dropped) so the SAME pattern runs in Spark (java.util.regex) and the
# DuckDB oracle (RE2): contractions, optional-space letter runs,
# optional-space digit runs, optional-space punctuation runs,
# whitespace runs. Token COUNT approximates BPE pre-split cost, the
# usual training-data budgeting proxy.
BPE_PRETOKEN_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """Number of BPE pre-tokens (long). Pure column expression —
    regexp_extract_all stays inside whole-stage codegen."""
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
    ).cast("long")


def _hits(toks: Column, words: Sequence[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct, type/token ratio (decimal-rounded)."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    n_dis = F.size(F.array_distinct(toks)).cast("long")
    return df.withColumns({
        "n_tokens": n_tok,
        "n_distinct": n_dis,
        "distinct_ratio": F.round(
            n_dis.cast("decimal(18,6)") / n_tok.cast("decimal(18,6)"), 4
        ).cast("double"),
    })


def with_quality(df: DataFrame, text_col: str = "text",
                 min_tokens: int = 5, max_stopword_pct: int = 90) -> DataFrame:
    """Integer-arithmetic quality gate: length + stopword-ratio caps."""
    toks = _tokens(F.col(text_col))
    n_stop = _hits(toks, STOPWORDS_EN).cast("long")
    n_tok = F.size(toks).cast("long")
    return df.withColumns({
        "n_stopwords": n_stop,
        "passes_quality": F.when(
            (n_tok >= min_tokens)
            & (n_stop * 100 <= n_tok * max_stopword_pct), 1).otherwise(0),
    })


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """argmax of per-language stopword evidence, tie -> 'en'."""
    toks = _tokens(F.col(text_col))
    es = _hits(toks, _LANG_EVIDENCE["es"])
    en = _hits(toks, _LANG_EVIDENCE["en"])
    return df.withColumn(
        "predicted_lang", F.when(es > en, "es").otherwise("en"))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     n_prefix_tokens: int = 8) -> DataFrame:
    """Prefix-shingle md5 fingerprint (rolling-hash family)."""
    first_n = F.slice(_tokens(F.col(text_col)), 1, n_prefix_tokens)
    return df.withColumn("fingerprint", F.md5(F.array_join(first_n, " ")))
