"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship KG-construction run — documents.parquet adapted to
the transcript shape, full extract -> link -> canonicalize ->
materialize pipeline, returns the (subj, pred, obj) triple DataFrame.

queries()/oracle_sql(): operator-family registry from
rkts_migration_spark.queries (+ queries_kg) — each Spark query paired
with an ANSI-SQL DuckDB oracle where expressible; the trie-extraction
path is rows-only as allowed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rkts_migration_spark import queries as _q
from rkts_migration_spark import queries_ext as _qext  # noqa: F401  (registers)
from rkts_migration_spark import queries_kg as _qkg  # noqa: F401  (registers)
from rkts_migration_spark.queries_kg import kg_triples_trie


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Runs the full multi-token trie pipeline (the oracle-checked
    single-token twin is queries()['q_kg_triples_full'])."""
    return kg_triples_trie(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return _q.oracle_sql()
