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


# Named parameter presets: "demo" keeps the oracle corpus cheap;
# "production" is the scale configuration (k=128 hashes in 16 bands of
# 8 -> candidate recall ~ standard near-dup detection practice; 5-word
# shingles; 64-bit SimHash). Both run through the same operators — the
# preset only changes constants, never the plan shape.
PRESETS: dict[str, dict] = {
    "demo": {"k": 4, "bands": 1, "shingle_n": 3, "simhash_bits": 4},
    "production": {"k": 128, "bands": 16, "shingle_n": 5, "simhash_bits": 64},
}


def minhash_band_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 128, bands: int = 16, shingle_n: int = 5,
    use_xxhash: bool = False,
) -> DataFrame:
    """(id, b0..b{bands-1}) band-bucket keys: the signature split into
    ``bands`` groups of k/bands rows, each group collapsed to one
    bucket hash. Docs sharing ANY bucket column value are candidates —
    downstream joins group on one narrow column per band instead of
    k signature columns.

    use_xxhash=True swaps the md5 hash family for xxhash64 (JVM
    intrinsic, no hex-string materialization — the fast path for
    production runs); md5 is the engine-portable family the DuckDB
    oracle can mirror bit-for-bit."""
    if k % bands:
        raise ValueError(f"bands={bands} must divide k={k}")
    sh = word_shingles(df, text_col, id_col, shingle_n)
    if use_xxhash:
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(k)
        ]
    else:
        aggs = [
            F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(k)
        ]
    sig = sh.groupBy(id_col).agg(*aggs)
    rpb = k // bands
    bucket_cols = [
        F.md5(F.concat_ws("|", *[
            F.col(f"h{i}").cast("string") for i in range(b * rpb, (b + 1) * rpb)
        ])).alias(f"b{b}")
        for b in range(bands)
    ]
    return sig.select(id_col, *bucket_cols)


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash as two exact 32-bit halves (simhash_hi,
    simhash_lo) — BIGINT-safe in every engine (a single signed 64-bit
    column would overflow at bit 63). Bit j = majority vote over
    tokens of sha256 hex digit j >= '8'; near-dups have small Hamming
    distance over the packed 64 bits. Same single explode + groupBy
    shuffle shape as the 4-bit demo simhash."""
    words = df.filter(F.length(text_col) > 0).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    hexd = F.sha2(F.col("w"), 256)

    def half(offset: int):
        expr = None
        for i in range(32):
            vote = F.sum(
                F.when(F.substring(hexd, offset + i + 1, 1) >= "8", 1)
                .otherwise(0))
            term = (vote * 2 > F.count(F.lit(1))).cast("long") * (1 << (31 - i))
            expr = term if expr is None else expr + term
        return expr

    return words.groupBy(id_col).agg(
        half(0).alias("simhash_hi"), half(32).alias("simhash_lo"))


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, max_bucket: int | None = 100_000,
) -> DataFrame:
    """Hamming-distance near-dup pairs over the 64-bit SimHash via the
    Manku/Jain/Sarma pigeonhole trick (WWW'07, the classic web-dedup
    method): split the signature into ``max_hamming + 1`` equal
    chunks — any pair within Hamming distance k must agree EXACTLY on
    at least one chunk — bucket-join on (chunk_index, chunk_value),
    then verify the exact distance with bit_count(xor) and keep pairs
    <= k. Returns (doc_a, doc_b, hamming) with doc_a < doc_b.

    Scale shape: the shuffle carries (doc, chunk) rows — k+1 per
    document, never document pairs — and the join is an equi-join on
    narrow integer keys; the only pairs ever materialized are
    bucket-collisions, the same candidate-bounded contract as the
    MinHash LSH path. A chunk that collides for many docs (e.g. the
    all-zeros chunk of empty-ish documents) is the analog of a hot
    LSH bucket, and ``max_bucket`` guards it the same way as
    jaccard's max_df / neardup's bucket cap: a partial-agg count per
    (band, chunk) and a broadcast anti join drop over-cap buckets
    (members lose that chunk's pairing chance — remove byte-identical
    mass duplicates with exact_dedup first). Verification is
    row-local integer XOR — no second shuffle beyond the pair dedup.

    ``max_hamming`` must be one of 1 / 3 / 7 so the chunk count
    (k + 1 = 2 / 4 / 8) divides the two 32-bit signature halves
    evenly."""
    if max_hamming not in (1, 3, 7):
        raise ValueError("max_hamming must be 1, 3 or 7 (chunks must "
                         "divide the two 32-bit halves evenly)")
    n_chunks = max_hamming + 1
    per_half = n_chunks // 2
    width = 32 // per_half
    mask = (1 << width) - 1

    sig = simhash64(df, text_col, id_col)
    chunks = []
    for half_col in ("simhash_hi", "simhash_lo"):
        for j in range(per_half):
            shift = 32 - width * (j + 1)
            chunks.append(
                F.shiftright(F.col(half_col), shift).bitwiseAND(F.lit(mask)))
    posted = sig.select(
        F.col(id_col), "simhash_hi", "simhash_lo",
        F.posexplode(F.array(*chunks)).alias("_band", "_chunk"),
    )
    if max_bucket is not None:
        hot = (
            posted.groupBy("_band", "_chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("_band", "_chunk")
        )
        posted = posted.join(
            F.broadcast(hot), ["_band", "_chunk"], "left_anti")
    a = posted.select(
        F.col(id_col).alias("doc_a"), F.col("simhash_hi").alias("_ha"),
        F.col("simhash_lo").alias("_la"), "_band", "_chunk")
    b = posted.select(
        F.col(id_col).alias("doc_b"), F.col("simhash_hi").alias("_hb"),
        F.col("simhash_lo").alias("_lb"), "_band", "_chunk")
    hamming = (
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        + F.bit_count(F.col("_la").bitwiseXOR(F.col("_lb")))
    ).cast("int")
    return (
        a.join(b, ["_band", "_chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


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


def jaccard_pairs_from_postings(
    postings: DataFrame, id_col: str = "doc_id", token_col: str = "w",
    threshold_pct: int = 80, max_df: int | None = 1000,
    cache: bool = True,
) -> DataFrame:
    """(id, token) postings -> (doc_a, doc_b, jaccard >= threshold) via
    the inverted-index self-join: shuffle carries postings, pair counts
    come from the groupBy — O(sum of posting-list^2 per token), never
    O(n^2 docs).

    ``max_df`` is the scale guard: tokens appearing in more than
    ``max_df`` documents (stop words) are dropped BEFORE the self-join,
    because a posting list of n docs yields ~n^2/2 pairs — one hot
    token on a real corpus is quadratic blowup. Jaccard is then
    computed consistently over the capped token space (document sizes
    count only surviving tokens), i.e. stop-word-removed Jaccard —
    self-consistent and engine-mirrorable. Pass ``max_df=None`` only
    on pre-bounded inputs (e.g. postings restricted to LSH candidate
    buckets).

    The guard itself must be scale-safe: counting document frequency
    with a window (`COUNT OVER (PARTITION BY token)`) would colocate a
    hot token's ENTIRE posting list in one task before filtering it —
    the exact blowup the guard exists to prevent. Instead the count is
    a `groupBy(token).count()` (map-side partial aggregation shrinks
    every split to one row per token before the shuffle), the
    over-cap tokens become a broadcast heavy-hitter list, and postings
    drop them with a broadcast LEFT ANTI join — no shuffle of the
    postings at all. The heavy-hitter list is bounded by
    |postings| / max_df distinct tokens (each needs > max_df rows),
    so at max_df=1000 it is 1000x smaller than the corpus —
    broadcast-sized by construction.

    ``cache``: the (guarded) postings feed THREE consumers — both
    sides of the self-join and the per-doc size aggregation — and
    Spark performs no common-subexpression reuse across a DataFrame
    DAG (measured: 8 source scans + 4 rebuilds of the identical hot
    list in the uncached final plan, zero ReusedExchange). With
    ``cache=True`` (default) the guarded postings persist
    memory-and-disk (the pipeline.py stage-cache convention), so the
    source is scanned once and the anti join runs once; at 100 TB
    this disk-backed materialization is the same stage-table pattern
    a production dedup run uses. Pass ``cache=False`` to keep the
    plan fully recomputed (e.g. when the caller already persists).
    The persisted handle is attached to the result — call
    operators/caching.release_cached_deps(result) after the consuming
    action to free it (chained passes in one session otherwise
    accumulate cached stage tables)."""
    from .caching import attach_cached_deps

    deps = []
    if max_df is not None:
        hot = (
            postings.groupBy(token_col)
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select(token_col)
        )
        postings = postings.join(F.broadcast(hot), token_col, "left_anti")
    if cache:
        postings = postings.persist()
        deps.append(postings)
    sizes = postings.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_words"))
    a, b = postings.alias("a"), postings.alias("b")
    inter = (
        a.join(b, (F.col(f"a.{token_col}") == F.col(f"b.{token_col}"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_words").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("n_inter")
    out = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("n_inter") * 100 >= union_sz * threshold_pct)
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_inter").cast("decimal(18,6)")
                    / union_sz.cast("decimal(18,6)"), 4)
            .cast("double").alias("jaccard"),
        )
    )
    return attach_cached_deps(out, deps)


def jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold_pct: int = 80, max_df: int | None = 1000,
    cache: bool = True,
) -> DataFrame:
    """Word-set Jaccard >= threshold over distinct-word postings; see
    jaccard_pairs_from_postings for the max_df hot-token guard and
    the ``cache`` postings-reuse knob."""
    words = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    return jaccard_pairs_from_postings(
        words, id_col=id_col, threshold_pct=threshold_pct, max_df=max_df,
        cache=cache)


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3-style n-gram overlap
    check): flag corpus documents sharing >= ``min_overlap`` distinct
    n-word shingles with ANY benchmark document, returning
    (``id_col``, n_overlap). Docs with no overlap are absent — join
    back to the corpus (left_anti on the result) for the keep-list.

    Scale shape, asymmetric by design: both sides reduce to
    (id, shingle) postings via the same word_shingles the MinHash
    family uses, but the benchmark side collapses to DISTINCT shingle
    keys — WHICH benchmark doc matched doesn't matter — and real
    benchmark suites are MBs against a 100-TB corpus, so that side is
    broadcast-sized. The overlap probe then ships zero corpus bytes:
    each corpus posting checks the broadcast hash relation map-side,
    and the only shuffle is the per-doc overlap count with map-side
    partial aggregation. Shingles are compared as xxhash64 keys
    (8 bytes each, so a 1M-shingle benchmark broadcasts in ~8 MB); a
    64-bit collision could only OVER-flag, the safe direction for
    decontamination. Corpus postings are distinct per doc by
    construction (word_shingles dedups), so a plain count() suffices
    for the overlap size."""
    c_sh = word_shingles(corpus, text_col, id_col, n).select(
        id_col, F.xxhash64("sh").alias("_k"))
    b_sh = (
        word_shingles(benchmark, text_col, id_col, n)
        .select(F.xxhash64("sh").alias("_k"))
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "_k")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def neardup_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 128, bands: int = 16, shingle_n: int = 5,
    use_xxhash: bool = True, cache: bool = True,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b): MinHash band buckets, one
    narrow bucket equi-join per band, deduped across bands. Never a
    doc x doc join — the shuffle carries (id, bucket) rows.

    ``max_bucket`` is the hot-bucket guard (same class as jaccard's
    max_df): a boilerplate document duplicated 10^6 times at 100 TB
    puts 10^6 docs in one bucket in EVERY band -> 10^12 pairs from
    a single self-join cell. Buckets larger than the cap are counted
    with a partially-aggregating groupBy (one row per (band, bucket)
    per split — never a colocated member list) and dropped from both
    join sides via a broadcast anti join; the hot list is bounded at
    |docs|·bands / max_bucket entries, broadcast-sized by
    construction. Trade-off, stated: members of a dropped bucket lose
    that band's pairing chance (byte-identical mass duplicates should
    be removed by exact_dedup BEFORE LSH — that is the pipeline order
    neardup_clusters documents). Pass ``max_bucket=None`` to disable.

    ``cache`` persists the band-bucket table (memory-and-disk): it is
    referenced on BOTH sides of every per-band join (2 x bands
    references), and without the persist each reference re-derives
    the full shingle + k-hash signature aggregation from the source
    (Spark has no cross-DAG subtree reuse) — at k=128/bands=16 that
    is 32 signature recomputations for one candidate pass. The
    cached table is narrow: one row per doc, bands bucket hashes."""
    from .caching import attach_cached_deps

    deps = []
    buckets = minhash_band_buckets(
        df, text_col, id_col, k=k, bands=bands, shingle_n=shingle_n,
        use_xxhash=use_xxhash,
    )
    if cache:
        buckets = buckets.persist()
        deps.append(buckets)
    hot = None
    if max_bucket is not None:
        posted = buckets.select(
            F.posexplode(
                F.array(*[F.col(f"b{b}") for b in range(bands)])
            ).alias("_band", "_bk"))
        hot = (
            posted.groupBy("_band", "_bk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("_band", "_bk")
            .persist()
        )
        deps.append(hot)
    cand = None
    for b in range(bands):
        a_side = buckets.select(F.col(id_col).alias("doc_a"),
                                F.col(f"b{b}").alias("_bk"))
        b_side = buckets.select(F.col(id_col).alias("doc_b"),
                                F.col(f"b{b}").alias("_bk"))
        if hot is not None:
            hot_b = hot.filter(F.col("_band") == b).select("_bk")
            a_side = a_side.join(F.broadcast(hot_b), "_bk", "left_anti")
            b_side = b_side.join(F.broadcast(hot_b), "_bk", "left_anti")
        p = (a_side.join(b_side, "_bk")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b"))
        cand = p if cand is None else cand.unionByName(p)
    return attach_cached_deps(cand.distinct(), deps)


def neardup_verified_edges(
    df: DataFrame, cand: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", threshold_pct: int = 80,
    cache: bool = True,
) -> DataFrame:
    """Exact word-set-Jaccard verification of candidate pairs, from
    POSTINGS rather than arrays: joining full word arrays onto pairs
    replicates a hub document's entire array once per candidate pair
    (a doc in 10^3+ pairs ships 10^3 copies of a possibly-large array
    through one join, with whole-array rows concentrating in few
    tasks). Instead the candidate pairs join narrow (doc, word)
    postings — per-pair intersection counts come from a groupBy with
    map-side partials, every row is one word wide, and the shuffle
    spreads by (doc, word) hash. Same exact semantics: postings are
    distinct words per doc, so matching rows count |A ∩ B|;
    |A ∪ B| = |A| + |B| - |A ∩ B|. Returns surviving (doc_a, doc_b).

    ``cache`` persists the postings (memory-and-disk), which feed
    three consumers (both sides of the pair join + the size agg) and
    would otherwise be re-derived from the source per consumer — see
    jaccard_pairs_from_postings for the measured no-reuse behavior."""
    from .caching import attach_cached_deps

    deps = []
    postings = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("_w"),
    )
    if cache:
        postings = postings.persist()
        deps.append(postings)
    sizes = postings.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    pa = postings.select(F.col(id_col).alias("doc_a"), "_w")
    pb = postings.select(F.col(id_col).alias("doc_b"), "_w")
    inter = (
        cand.join(pa, "doc_a")
        .join(pb, ["doc_b", "_w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("_n").alias("_nb"))
    union = F.col("_na") + F.col("_nb") - F.col("_inter")
    out = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("_inter") * 100 >= union * threshold_pct)
        .select("doc_a", "doc_b")
    )
    return attach_cached_deps(out, deps)


def neardup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 128, bands: int = 16, shingle_n: int = 5,
    threshold_pct: int = 80, use_xxhash: bool = True,
) -> DataFrame:
    """End-to-end near-duplicate clustering — the canonical corpus-
    dedup flow at 100 TB: MinHash-LSH band buckets propose candidate
    pairs (bucket equi-joins, never doc x doc), each candidate is
    VERIFIED with exact word-set Jaccard from narrow postings (the
    candidate set is LSH-bounded, so no hot-token cap is needed on
    the verify; see neardup_verified_edges), verified pairs become
    edges for pointer-doubling connected components (operators/cc.py),
    and every document lands in a cluster keyed by its min member id.

    Returns (``id_col``, cluster_id, keep): one row per input doc,
    singletons cluster with themselves, ``keep`` marks the cluster
    representative (min id under the NUMERIC order of the first digit
    run — swap in first_wins on a quality column upstream if
    representative choice should be quality-aware). Dedup =
    ``.filter("keep")``.

    CC labels travel as strings internally, so ids are zero-padded to
    int64 width (pad_id_col, the cc.py convention) before components
    run and mapped back after — callers need no ordering precondition
    ('9' vs '10' resolves numerically). The node encoding appends the
    RAW id after a \\x1f separator so it stays collision-free: two
    distinct ids that pad identically ('doc7' vs 'doc007' — leading
    zeros in the first digit run are absorbed by the pad) remain
    distinct nodes; the pad is still the primary sort key, so the
    representative is the numeric-min id with raw-string tiebreak."""
    from ..functions.ids import pad_id_col
    from .caching import attach_cached_deps, cached_deps_of, release_cached_deps

    def _pad(c):
        s = c.cast("string")
        return F.concat(pad_id_col(s, width=19), F.lit("\x1f"), s)

    ids = df.select(F.col(id_col)).distinct()
    cand = neardup_candidates(
        df, text_col, id_col, k=k, bands=bands, shingle_n=shingle_n,
        use_xxhash=use_xxhash,
    )
    verified = neardup_verified_edges(
        df, cand, text_col, id_col, threshold_pct=threshold_pct,
    )
    edges = verified.select(_pad(F.col("doc_a")).alias("src"),
                            _pad(F.col("doc_b")).alias("dst"))
    attach_cached_deps(edges, cached_deps_of(cand) + cached_deps_of(verified))

    from .cc import connected_components

    # connected_components localCheckpoints its inputs eagerly, so the
    # candidate/postings caches are fully consumed once it returns —
    # release them here instead of leaking them to the caller.
    comp = connected_components(edges)
    release_cached_deps(edges)
    idmap = ids.select(F.col(id_col), _pad(F.col(id_col)).alias("_pid"))
    # padded representative label -> original id, for the map-back
    reps = idmap.select(F.col("_pid").alias("component"),
                        F.col(id_col).alias("_rep"))
    out = (
        idmap.join(comp, idmap["_pid"] == comp["node"], "left")
        .join(reps, "component", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_rep"), F.col(id_col)).alias("cluster_id"),
        )
    )
    # the CC component label IS the (padded) min member id, so the
    # representative test is a row-local comparison — no extra shuffle
    return out.withColumn("keep", F.col(id_col) == F.col("cluster_id"))
