"""Triple materialization: every family from the vocab.py contract,
assembled with pure column expressions and unioned into one narrow
(subj, pred, obj) DataFrame.

Plan shape (scale rationale):
- Turn-family triples are built with ONE pass over the turns stage via
  array+explode (not 5 unioned scans of the same table).
- Section triples reuse the conv-partitioned window shuffle computed by
  the ordered stage.
- topEntity uses the salted two-phase count (operators/salt.py) because
  conversation sizes are Zipf-skewed.
- Label pref/alt uses order-aware first-wins windows (operators/dedup.py),
  the distributed analog of seenTitles/seenLangs
  (/root/reference/kernelxmltottl.php:88-89,205-227).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V
from .canonicalize import apply_canonical
from .functions.ids import (
    conv_iri_col,
    entity_iri_col,
    int_lit_col,
    pad_id_col,
    section_iri_col,
    turn_iri_col,
)
from .functions.text import norm_label_col, str_lit_col
from .operators.dedup import first_wins, with_first_flag
from .operators.salt import salted_count
from .operators.sections import section_bounds

TRIPLE_COLS = ("subj", "pred", "obj")


def _t(subj, pred: str, obj) -> F.Column:
    return F.struct(
        subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
    )


def turn_triples(turns: DataFrame) -> DataFrame:
    """partOf / turnIndex / role / usedTool / text — one scan, explode."""
    tiri = turn_iri_col(F.col("conv_id"), F.col("turn_idx"))
    ciri = conv_iri_col(F.col("conv_id"))
    fam = F.array(
        _t(tiri, V.PRED_PART_OF, ciri),
        _t(tiri, V.PRED_TURN_INDEX, int_lit_col(F.col("turn_idx"))),
        _t(tiri, V.PRED_ROLE, str_lit_col(F.col("role"), "en")),
        F.when(
            F.col("tool").isNotNull(),
            _t(tiri, V.PRED_USED_TOOL, str_lit_col(F.col("tool"), "en")),
        ),
        F.when(
            ~F.col("text").isin(*V.PLACEHOLDERS),
            _t(tiri, V.PRED_TEXT, str_lit_col(F.col("text"), "en")),
        ),
    )
    return (
        turns.select(F.explode(fam).alias("t"))
        .filter(F.col("t").isNotNull())
        .select("t.subj", "t.pred", "t.obj")
    )


def conv_triples(turns: DataFrame) -> DataFrame:
    """(conv, nTurns, n) — single count agg per conversation."""
    return (
        turns.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            conv_iri_col(F.col("conv_id")).alias("subj"),
            F.lit(V.PRED_N_TURNS).alias("pred"),
            int_lit_col(F.col("n")).alias("obj"),
        )
    )


def section_triples(turns_with_section: DataFrame) -> DataFrame:
    """hasSection / sectionIndex / beginTurn / endTurn per island."""
    bounds = section_bounds(turns_with_section)
    siri = section_iri_col(F.col("conv_id"), F.col("section_idx"))
    fam = F.array(
        _t(conv_iri_col(F.col("conv_id")), V.PRED_HAS_SECTION, siri),
        _t(siri, V.PRED_SECTION_INDEX, int_lit_col(F.col("section_idx"))),
        _t(siri, V.PRED_BEGIN_TURN,
           turn_iri_col(F.col("conv_id"), F.col("begin_turn_idx"))),
        _t(siri, V.PRED_END_TURN,
           turn_iri_col(F.col("conv_id"), F.col("end_turn_idx"))),
    )
    return bounds.select(F.explode(fam).alias("t")).select(
        "t.subj", "t.pred", "t.obj"
    )


def _with_entity_iri(df: DataFrame, abstract_lookup: DataFrame) -> DataFrame:
    """Attach entity_iri for a canon_id column via broadcast abstract join."""
    return df.join(F.broadcast(abstract_lookup), "canon_id", "left").withColumn(
        "entity_iri", entity_iri_col(F.col("canon_id"), F.col("abstract_local"))
    )


def mention_triples(linked_canon: DataFrame, abstract_lookup: DataFrame) -> DataFrame:
    """(turn, mentions, entity) — distinct per (turn, canonical entity)."""
    df = _with_entity_iri(linked_canon, abstract_lookup)
    return (
        df.select(
            turn_iri_col(F.col("conv_id"), F.col("turn_idx")).alias("subj"),
            F.lit(V.PRED_MENTIONS).alias("pred"),
            F.col("entity_iri").alias("obj"),
        )
        .distinct()
    )


def top_entity_triples(
    linked_canon: DataFrame, abstract_lookup: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """(conv, topEntity, entity): max mention count per conversation,
    ties -> numeric-min canonical id. Two-phase salted count because
    conv sizes are Zipf-skewed."""
    counts = salted_count(
        linked_canon,
        keys=["conv_id", "canon_id"],
        salt_from=["turn_idx", "midx"],
        buckets=salt_buckets,
    )
    top = (
        counts.withColumn("_pad", pad_id_col(F.col("canon_id")))
        .groupBy("conv_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("negc"),
                    F.col("_pad").alias("pad"),
                    F.col("canon_id").alias("canon_id"),
                )
            ).alias("w")
        )
        .select("conv_id", F.col("w.canon_id").alias("canon_id"))
    )
    top = _with_entity_iri(top, abstract_lookup)
    return top.select(
        conv_iri_col(F.col("conv_id")).alias("subj"),
        F.lit(V.PRED_TOP_ENTITY).alias("pred"),
        F.col("entity_iri").alias("obj"),
    )


def label_triples(linked_canon: DataFrame, abstract_lookup: DataFrame) -> DataFrame:
    """prefLabel (first per (entity, lang)) / altLabel (later distinct
    normalized labels) under corpus document order (conv, turn, midx)."""
    base = linked_canon.withColumn("norm_label", norm_label_col(F.col("matched")))
    # first occurrence of each distinct normalized label per entity
    label_winners = first_wins(
        base,
        group_cols=["canon_id", "norm_label"],
        order_cols=["conv_id", "turn_idx", "midx"],
    )
    flagged = with_first_flag(
        label_winners,
        group_cols=["canon_id", "lang"],
        order_cols=["conv_id", "turn_idx", "midx"],
        flag_col="is_pref",
    )
    df = _with_entity_iri(flagged, abstract_lookup)
    return df.select(
        F.col("entity_iri").alias("subj"),
        F.when(F.col("is_pref"), F.lit(V.PRED_PREF_LABEL))
        .otherwise(F.lit(V.PRED_ALT_LABEL))
        .alias("pred"),
        str_lit_col(F.col("matched"), F.col("lang")).alias("obj"),
    )


def entity_prop_triples(
    entity_props: DataFrame,
    canonical_map: DataFrame,
    abstract_lookup: DataFrame,
    mentioned_canon: DataFrame,
) -> DataFrame:
    """workIsAbout/workGenre for mentioned canonical entities; self-
    reference rows dropped (/root/reference/kernelxmltottl.php:40-42)."""
    props = entity_props.filter(F.col("obj") != F.col("entity_ref"))
    props = apply_canonical(props, canonical_map, "entity_ref", "canon_id")
    props = props.join(mentioned_canon, "canon_id", "left_semi")
    # two source refs can canonicalize to the same (canon, prop, obj)
    props = props.select("canon_id", "prop", "obj").distinct()
    df = _with_entity_iri(props, abstract_lookup)
    return df.select(
        F.col("entity_iri").alias("subj"),
        F.when(F.col("prop") == "ab", F.lit(V.PRED_WORK_IS_ABOUT))
        .otherwise(F.lit(V.PRED_WORK_GENRE))
        .alias("pred"),
        F.concat(
            F.when(F.col("prop") == "ab", F.lit(V.TOPIC)).otherwise(F.lit(V.GENRE)),
            F.col("obj"),
        ).alias("obj"),
    )


def assemble_triples(
    turns_with_section: DataFrame,
    linked_canon: DataFrame,
    canonical_map: DataFrame,
    abstract_lookup: DataFrame,
    entity_props: DataFrame,
    salt_buckets: int = 16,
) -> DataFrame:
    """Union of every family — the global-graph union (U1 analog,
    /root/reference/utils.php:833-840).

    No global distinct: the families are pairwise disjoint (each owns
    its predicates) and each is internally unique — mentions and props
    carry their own distinct; turn/conv/section/label/topEntity rows
    are unique by construction (one row per turn/conv/island/winner).
    A trailing distinct would re-shuffle the entire output for nothing
    — at 100 TB that is the single biggest avoidable exchange."""
    mentioned = linked_canon.select("canon_id").distinct()
    fams = [
        turn_triples(turns_with_section),
        conv_triples(turns_with_section),
        section_triples(turns_with_section),
        mention_triples(linked_canon, abstract_lookup),
        top_entity_triples(linked_canon, abstract_lookup, salt_buckets),
        label_triples(linked_canon, abstract_lookup),
        entity_prop_triples(
            entity_props, canonical_map, abstract_lookup, mentioned
        ),
    ]
    out = fams[0]
    for f in fams[1:]:
        out = out.unionByName(f)
    return out
