"""Materialized tree paths: the distributed analog of the reference's
recursive subitem walk (part trees, /root/reference/editionxmltottl.php:256-262,
partTreeIndex W4 at :171,196): each node's path is the '.'-joined
label chain from its root.

Level-synchronous iteration: one equi-join per tree level (children of
the current frontier resolve their paths), `localCheckpoint` per round
to cap lineage, terminating when a level is empty — the same
driver-loop pattern as operators/cc.py (no Catalyst feature covers
iteration, SURVEY.md §4.2). For pathological depths a pointer-doubling
variant (O(log d) rounds, each squaring the jump) drops in without
changing the contract.

The child table is checkpointed ONCE before the loop (like cc.py's
edge table): when `parent` is an expression over the source columns,
Catalyst's constraint inference composes that expression through each
level's join, doubling the scan filter per level until codegen falls
past the JVM's 64 KB method limit and the whole stage drops to
interpreted mode. An opaque child table keeps every level's plan
constant-size, and reading the materialized RDD L times also beats L
re-scans of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tree_paths(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    label_col: str = "label",
    sep: str = ".",
    max_iter: int = 64,
) -> DataFrame:
    """nodes (id, parent [null for roots], label) -> (id, path).

    path = root label <sep> ... <sep> own label. Orphans (parents that
    never resolve) are absent from the output — surface them by
    anti-joining the input against the result (error channel)."""
    roots = nodes.filter(F.col(parent_col).isNull()).select(
        F.col(id_col).alias("id"), F.col(label_col).alias("path")
    )
    children = nodes.filter(F.col(parent_col).isNotNull()).select(
        F.col(id_col).alias("cid"),
        F.col(parent_col).alias("pid"),
        F.col(label_col).alias("clabel"),
    ).localCheckpoint()
    frontier = roots.localCheckpoint()
    levels = [frontier]
    exhausted = True
    for _ in range(max_iter):
        nxt = (
            children.join(frontier, children.pid == frontier.id)
            .select(
                F.col("cid").alias("id"),
                F.concat(F.col("path"), F.lit(sep), F.col("clabel")).alias("path"),
            )
        ).localCheckpoint()
        if nxt.isEmpty():
            exhausted = False
            break
        levels.append(nxt)
        frontier = nxt
    if exhausted:
        # the last frontier still had children to resolve: nodes deeper
        # than max_iter would otherwise be silently dropped and look
        # identical to orphans — fail loudly instead.
        n_unresolved = children.join(
            frontier, children.pid == frontier.id).count()
        if n_unresolved:
            raise RuntimeError(
                f"tree_paths: max_iter={max_iter} reached with "
                f"{n_unresolved} unresolved child nodes below the last "
                f"frontier; raise max_iter (tree deeper than assumed)"
            )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
