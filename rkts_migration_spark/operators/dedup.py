"""Order-aware dedup (A1/A2) + document-level dedup family.

first_wins: the distributed form of the reference's `seenTitles` /
`seenLangs` sets (/root/reference/kernelxmltottl.php:88-89,205-227):
within each group, the row with the smallest order key survives.
NOT dropDuplicates — that keeps an arbitrary row; here order is the
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_wins(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Keep the first row per group under a total order (ties broken by
    the full order-col tuple, which callers make unique)."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_rank")
    )


def with_first_flag(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    flag_col: str = "is_first",
) -> DataFrame:
    """Like first_wins but keeps every row, flagging the winner —
    prefLabel (first) vs altLabel (rest) in one pass."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(flag_col, F.row_number().over(w) == 1)


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content dedup: keep one representative per sha2(text)
    (min of the remaining columns' natural order keeps it
    deterministic). Scales as one hash-shuffle; at 100 TB partial
    aggregation makes the map side absorb most duplicates."""
    key = F.sha2(F.col(text_col), 256).alias("_h")
    cols = df.columns
    return (
        df.select(key, F.struct(*cols).alias("_row"))
        .groupBy("_h")
        .agg(F.min("_row").alias("_row"))
        .select("_row.*")
    )


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """MinHash signatures over word shingles (md5 hash family, engine-
    portable): sig_i = min over distinct words of md5(word#i). Equal
    signatures => near-dup candidates. One explode + one groupBy: the
    shuffle carries (doc, word) pairs, never document pairs."""
    words = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("w"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(k)
    ]
    return words.groupBy(id_col).agg(*aggs)


def word_shingles(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) rows: distinct n-word shingles per document,
    built JVM-side — tokens array once, then a transform over the
    sliding positions joined with spaces; documents shorter than n
    words contribute their whole text as one shingle."""
    toks = F.split(F.col(text_col), " ")
    shingles = F.when(
        F.size(toks) < n, F.array(F.col(text_col))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return df.filter(F.length(text_col) > 0).select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("sh"))


def minhash_signature_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 4, n: int = 3,
) -> DataFrame:
    """MinHash over n-word shingles (the shingle->minhash->band->bucket
    chain): order-sensitive near-dup detection — word-permuted texts
    that fool the bag-of-words signature produce different shingle
    sets. Same shuffle shape as minhash_signature: (doc, shingle)
    pairs, never document pairs."""
    sh = word_shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 4, bands: int = 1,
) -> DataFrame:
    """LSH banding: signatures split into `bands` groups of k/bands
    rows; docs sharing any full band are candidates (doc_a < doc_b).
    The join shuffles per band-bucket — never the O(n^2) cross join."""
    sig = minhash_signature(df, text_col, id_col, k)
    rows_per_band = k // bands
    pairs = None
    for b in range(bands):
        cols = [f"h{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        a = sig.alias("a")
        bb = sig.alias("b")
        cand = (
            a.join(bb, on=[F.col(f"a.{c}") == F.col(f"b.{c}") for c in cols])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
        )
        pairs = cand if pairs is None else pairs.unionByName(cand)
    return pairs.distinct() if bands > 1 else pairs


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 4
) -> DataFrame:
    """SimHash: bit i = majority vote over tokens of md5-hex-digit(i)
    >= '8'. Integer majority arithmetic (engine-exact); near-dups have
    small Hamming distance between signatures."""
    words = df.filter(F.length(text_col) > 0).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))

    def bit(i: int, weight: int):
        vote = F.sum(
            F.when(F.substring(F.md5("w"), i, 1) >= "8", 1).otherwise(0))
        return (vote * 2 > F.count(F.lit(1))).cast("int") * weight

    expr = None
    for i in range(bits):
        term = bit(i + 1, 1 << (bits - 1 - i))
        expr = term if expr is None else expr + term
    return words.groupBy(id_col).agg(expr.alias(f"simhash{bits}"))


def jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold_pct: int = 80,
) -> DataFrame:
    """Word-set Jaccard >= threshold via inverted-index self-join:
    shuffle carries (word, doc) postings, pair counts come from the
    groupBy — O(sum of posting-list^2 per word), not O(n^2 docs). At
    scale, run after minhash_candidates to bound posting lists."""
    words = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_words"))
    a, b = words.alias("a"), words.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_words").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("n_inter")
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("n_inter") * 100 >= union_sz * threshold_pct)
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_inter").cast("decimal(18,6)")
                    / union_sz.cast("decimal(18,6)"), 4)
            .cast("double").alias("jaccard"),
        )
    )
