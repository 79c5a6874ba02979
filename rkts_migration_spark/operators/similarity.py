"""Embedding similarity search: brute-force cosine top-k baseline and
an LSH-bucketed approximate variant (random-hyperplane signatures) —
the scale path that avoids the O(n*q) cross join.

Determinism: hyperplanes are derived from sha2 of (seed, plane, dim)
— pure column-free python floats computed once on the driver and
broadcast as literals — so re-runs and both engines agree; no RNG
state anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized(col) -> F.Column:
    """float vector -> integer vector (x1000): integer dot products are
    order-independent and exact across engines."""
    return F.transform(col, lambda x: F.round(x * 1000).cast("long"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sqnorm(a) -> F.Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    queries: DataFrame, base: DataFrame, k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force). queries must be
    small (it is broadcast against the full base)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col)).alias("qv"))
    b = base.select(
        F.col(id_col).alias("neighbor_id"), _quantized(F.col(vec_col)).alias("bv"))
    scored = (
        F.broadcast(q).crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _dot(F.col("qv"), F.col("bv")).alias("dot"),
            _sqnorm(F.col("qv")).alias("qn"),
            _sqnorm(F.col("bv")).alias("bn"),
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("qn").cast("double") * F.col("bn").cast("double"))
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from sha256 —
    stable across runs/engines, no RNG object."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8,
               seed: int = 42) -> DataFrame:
    """Random-hyperplane signature: bit p = sign(v . plane_p). Vectors
    in the same bucket are cosine-similar candidates; the candidate
    join shuffles per bucket instead of crossing the full base."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p, plane in enumerate(planes):
        dot_p = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(x) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot_p >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", sig)


def lsh_topk(
    queries: DataFrame, base: DataFrame, dim: int, k: int = 5,
    n_planes: int = 8, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates. Recall
    improves with fewer planes / multiple tables; this single-table
    variant is the building block."""
    qb = lsh_bucket(queries, vec_col, dim, n_planes).select(
        F.col(id_col).alias("query_id"),
        _quantized(F.col(vec_col)).alias("qv"), "lsh_bucket")
    bb = lsh_bucket(base, vec_col, dim, n_planes).select(
        F.col(id_col).alias("neighbor_id"),
        _quantized(F.col(vec_col)).alias("bv"), "lsh_bucket")
    scored = (
        qb.join(bb, "lsh_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _dot(F.col("qv"), F.col("bv")).alias("dot"),
            _sqnorm(F.col("qv")).alias("qn"),
            _sqnorm(F.col("bv")).alias("bn"),
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("qn").cast("double") * F.col("bn").cast("double"))
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )
