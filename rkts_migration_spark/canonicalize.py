"""Canonicalization: close entity-merge chains across the dictionary
edge sets (id_remap / cross_corpus_map / same_text_map) with the
iterative connected-components pass, then resolve abstract-IRI
overrides.

The reference resolves one hop per lookup (/root/reference/utils.php:99-119)
and special-cases one two-corpus merge with a stash/restore hack
(/root/reference/kernelxmltottl.php:90-102,234-241); the general fixpoint
here subsumes both (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.ids import pad_id_col
from .operators.cc import connected_components


def build_canonical_map(
    id_remap: DataFrame, cross_corpus_map: DataFrame, same_text_map: DataFrame
) -> DataFrame:
    """(entity_id, canon_id) for every id appearing in any dictionary.
    Representative = numeric-aware min id of each component. Ids not in
    the map are their own canonical (callers coalesce after a left join).
    """
    edges_raw = (
        id_remap.selectExpr("old_id as a", "new_id as b")
        .unionByName(cross_corpus_map.selectExpr("k_id as a", "t_id as b"))
        .unionByName(same_text_map.selectExpr("alias_id as a", "canonical_id as b"))
    )
    # CC runs on zero-padded ids so lexicographic min == numeric min
    edges = edges_raw.select(
        pad_id_col(F.col("a")).alias("src"), pad_id_col(F.col("b")).alias("dst")
    )
    comp = connected_components(edges)  # (node=pad, component=pad)

    nodes = (
        edges_raw.selectExpr("a as entity_id")
        .unionByName(edges_raw.selectExpr("b as entity_id"))
        .distinct()
        .withColumn("_pad", pad_id_col(F.col("entity_id")))
    )
    with_comp = nodes.join(comp, nodes._pad == comp.node, "inner").select(
        "entity_id", F.col("component")
    )
    # map the padded representative back to its raw id
    reps = nodes.selectExpr("entity_id as canon_id", "_pad as component")
    return with_comp.join(reps, "component", "inner").select("entity_id", "canon_id")


def apply_canonical(
    df: DataFrame, canonical_map: DataFrame, id_col: str, out_col: str
) -> DataFrame:
    """Left broadcast join + coalesce: unmapped ids canonicalize to
    themselves (utils.php:102-104 lookup semantics, chains pre-closed)."""
    cm = canonical_map.select(
        F.col("entity_id").alias(id_col), F.col("canon_id").alias("_canon_tmp")
    )
    return (
        df.join(F.broadcast(cm), id_col, "left")
        .withColumn(out_col, F.coalesce(F.col("_canon_tmp"), F.col(id_col)))
        .drop("_canon_tmp")
    )


def build_abstract_lookup(
    abstract_map: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """(canon_id, abstract_local): filter '?'/empty refs
    (/root/reference/utils.php:884-885), canonicalize refs, min IRI wins
    per canonical entity (order-free tie-break)."""
    filtered = abstract_map.filter(
        (F.length(F.trim(F.col("entity_ref"))) > 0)
        & ~F.col("entity_ref").contains("?")
    )
    canon = apply_canonical(filtered, canonical_map, "entity_ref", "canon_id_out")
    return canon.groupBy(F.col("canon_id_out").alias("canon_id")).agg(
        F.min("canonical_iri").alias("abstract_local")
    )
