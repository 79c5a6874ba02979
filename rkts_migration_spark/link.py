"""Entity linking: gazetteer-scored disambiguation of extracted mentions.

The winner for an ambiguous surface is (max weight, then min entity id
numeric-aware) — computed once per surface on the tiny gazetteer
dimension and broadcast-joined onto the mention stream, so
disambiguation costs zero shuffles on the big side (the J4/J5 pattern
from SURVEY.md §2.3: dictionary lookups become broadcast hash joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.ids import pad_id_col
from .functions.text import norm_surface_col


def surface_winners(gazetteer: DataFrame) -> DataFrame:
    """(surf_norm, entity_id, lang): per normalized surface, the row
    with max weight, ties broken by min numeric-aware entity id."""
    g = gazetteer.select(
        norm_surface_col(F.col("surface")).alias("surf_norm"),
        F.col("entity_id"),
        F.col("lang"),
        F.col("weight"),
        pad_id_col(F.col("entity_id")).alias("_pad"),
    )
    # min(struct(-weight, pad, ...)) == argmax weight with min-id tie-break
    pick = g.groupBy("surf_norm").agg(
        F.min(
            F.struct(
                (-F.col("weight")).alias("negw"),
                F.col("_pad").alias("pad"),
                F.col("entity_id").alias("entity_id"),
                F.col("lang").alias("lang"),
            )
        ).alias("w")
    )
    return pick.select(
        "surf_norm", F.col("w.entity_id").alias("entity_id"), F.col("w.lang").alias("lang")
    )


def link_mentions(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """mentions (conv_id, turn_idx, begin, matched) -> + (entity_id, lang)."""
    winners = surface_winners(gazetteer)
    return mentions.join(
        F.broadcast(winners), mentions.matched == winners.surf_norm, "inner"
    ).drop("surf_norm")


def link_and_canonicalize(
    mentions: DataFrame, gazetteer: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """link_mentions + apply_canonical in ONE pass over the mention
    stream: canon_id is a pure function of entity_id, which is a pure
    function of the matched surface, so the canonical join composes
    onto the gazetteer-sized winners DIMENSION (driver-cheap) and the
    23M-row (at sf0.1; ~10^12-turn-proportional in production) mention
    stream pays a single broadcast hash join instead of two
    back-to-back ones. Output schema and values are identical to
    apply_canonical(link_mentions(...), ...)."""
    from .canonicalize import apply_canonical

    winners = apply_canonical(
        surface_winners(gazetteer), canonical_map, "entity_id", "canon_id"
    )
    return mentions.join(
        F.broadcast(winners), mentions.matched == winners.surf_norm, "inner"
    ).drop("surf_norm")
