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


def with_repetition_stats(
    df: DataFrame, text_col: str = "text",
    max_dup_line_pct: int = 30, max_top_bigram_pct: int = 20,
) -> DataFrame:
    """Gopher/MassiveText-style repetition filters (Rae et al. 2021):
    duplicate-line fraction and most-frequent-word-bigram fraction,
    plus an integer-arithmetic ``passes_repetition`` gate (defaults
    mirror the published 0.30 / 0.20 thresholds).

    Everything is row-local array algebra inside whole-stage codegen —
    no explode, no shuffle, so the filter runs at scan speed over
    100 TB. The bigram mode is computed per row as
    max over distinct bigrams of its occurrence count (O(u·n) on the
    row's own array); document rows are bounded, so this never leaves
    the task. Fractions are decimal-rounded; the gate compares scaled
    integers (no float thresholds)."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("long")
    n_dup_lines = (n_lines - F.size(F.array_distinct(lines))).cast("long")

    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    bigrams = F.when(n_tok >= 2, F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams).cast("long")
    top_bigram_n = F.when(n_bigrams == 0, F.lit(0).cast("long")).otherwise(
        F.array_max(F.transform(
            F.array_distinct(bigrams),
            lambda d: F.size(F.filter(bigrams, lambda x: x == d)),
        )).cast("long"))

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.round(num.cast("decimal(18,6)") / den.cast("decimal(18,6)"), 4)
            .cast("double"))

    return df.withColumns({
        "dup_line_frac": _frac(n_dup_lines, n_lines),
        "top_bigram_frac": _frac(top_bigram_n, n_bigrams),
        "passes_repetition": F.when(
            (n_dup_lines * 100 <= n_lines * max_dup_line_pct)
            & (top_bigram_n * 100 <= n_bigrams * max_top_bigram_pct), 1
        ).otherwise(0),
    })


# Deliberately simple, auditable patterns (a production scrubber would
# swap in a vetted library list); \b word boundaries keep IDs inside
# longer tokens untouched.
PII_PATTERNS = (
    (r"[\w.+-]+@[\w-]+\.[\w.-]+", "<EMAIL>"),
    (r"(?:\+?1[ .-]?)?(?:\(\d{3}\)[ .-]?|\b\d{3}[ .-]?)\d{3}[ .-]?\d{4}\b",
     "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def with_pii_redacted(df: DataFrame, text_col: str = "text",
                      out_col: str = "text_redacted") -> DataFrame:
    """PII scrubbing pass: emails / NANP phone numbers / SSN-shaped
    ids replaced with typed placeholders, plus an n_redactions audit
    count. Chained regexp_replace — pure codegen, scan-speed; the
    count re-scans with regexp_count, still row-local (patterns are
    applied in PII_PATTERNS order; SSN last so phone/SSN overlaps
    resolve deterministically)."""
    redacted = F.col(text_col)
    n_red = F.lit(0).cast("long")
    for pat, token in PII_PATTERNS:
        n_red = n_red + F.regexp_count(redacted, F.lit(pat)).cast("long")
        redacted = F.regexp_replace(redacted, pat, token)
    return df.withColumns({out_col: redacted, "n_redactions": n_red})


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    key_col: str, seed: str = "0",
) -> DataFrame:
    """Deterministic per-stratum sampling for corpus mixing: keep a row
    iff pmod(xxhash64(seed, key), 1e6) < fraction[stratum] * 1e6.
    Unlike df.sampleBy, the decision is a pure function of the row KEY,
    so the sample is (a) identical at any parallelism / partitioning,
    (b) reproducible across reruns and engines, and (c) consistent
    across tables sharing the key (join two sampled tables and the
    strata still line up). Strata absent from ``fractions`` are
    dropped. One filter, no shuffle, codegen-friendly."""
    million = 1_000_000
    thresholds = F.create_map(*[
        x for k, v in fractions.items()
        for x in (F.lit(k), F.lit(int(round(v * million))))
    ])
    bucket = F.pmod(
        F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(million))
    return df.filter(
        bucket < F.coalesce(
            thresholds[F.col(strata_col)], F.lit(0)))
