"""KG-pipeline queries over the driver testdata: documents are adapted
to the transcript shape (entrydata.py), then each SQL-expressible
triple family gets a DuckDB mirror; the trie-extraction path (the one
genuinely non-SQL op) is registered rows-only, as the contract allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import vocab as V
from .entrydata import TRANSCRIPTS_FROM_DOCUMENTS_SQL, transcripts_from_documents
from .fixtures import fixtures_to_spark, make_fixtures
from .materialize import conv_triples, section_triples, turn_triples
from .operators.sections import with_section_index
from .pipeline import build_triples_inmem
from .queries import register

_TR = TRANSCRIPTS_FROM_DOCUMENTS_SQL

_ESCAPED = (
    "REPLACE(REPLACE(REPLACE(REPLACE(REPLACE({c}, "
    "chr(92), chr(92)||chr(92)), '\"', chr(92)||'\"'), "
    "chr(9), chr(92)||'t'), chr(10), chr(92)||'n'), chr(13), chr(92)||'r')"
)


def _kg_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    fx = make_fixtures(seed=42, n_convs=1)  # dictionaries only; tiny
    tables = fixtures_to_spark(spark, fx)
    tables["transcripts"] = transcripts_from_documents(spark, sf_dir)
    return tables


@register("q_kg_transcripts", f"""
SELECT conv_id, turn_idx, role, text, tool, ts FROM ({_TR})
""")
def q_kg_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents->transcripts adapter itself, engine-mirrored."""
    return transcripts_from_documents(spark, sf_dir)


@register("q_kg_turn_triples", f"""
WITH t AS ({_TR}),
     iri AS (
  SELECT printf('{V.CONV}%s/turn/%04d', conv_id, turn_idx) AS turn_iri,
         '{V.CONV}' || conv_id AS conv_iri, *
  FROM t)
SELECT subj, pred, obj FROM (
  SELECT turn_iri AS subj, '{V.PRED_PART_OF}' AS pred, conv_iri AS obj FROM iri
  UNION ALL
  SELECT turn_iri, '{V.PRED_TURN_INDEX}',
         '"' || CAST(turn_idx AS VARCHAR) || '"^^<{V.XSD_INT}>' FROM iri
  UNION ALL
  SELECT turn_iri, '{V.PRED_ROLE}', '"' || role || '"@en' FROM iri
  UNION ALL
  SELECT turn_iri, '{V.PRED_USED_TOOL}', '"' || tool || '"@en'
  FROM iri WHERE tool IS NOT NULL
  UNION ALL
  SELECT turn_iri, '{V.PRED_TEXT}',
         '"' || {_ESCAPED.format(c="text")} || '"@en'
  FROM iri WHERE text NOT IN ('', '-')
) u
""")
def q_kg_turn_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-family triples (single-scan explode) vs a UNION ALL oracle."""
    return turn_triples(transcripts_from_documents(spark, sf_dir))


@register("q_kg_conv_triples", f"""
WITH t AS ({_TR})
SELECT '{V.CONV}' || conv_id AS subj,
       '{V.PRED_N_TURNS}' AS pred,
       '"' || CAST(COUNT(*) AS VARCHAR) || '"^^<{V.XSD_INT}>' AS obj
FROM t GROUP BY conv_id
""")
def q_kg_conv_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_triples(transcripts_from_documents(spark, sf_dir))


@register("q_kg_section_triples", f"""
WITH t AS ({_TR}),
     flagged AS (
  SELECT conv_id, turn_idx,
         CASE WHEN LAG(role) OVER w IS NULL
                OR LAG(role) OVER w <> role THEN 1 ELSE 0 END AS chg
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
     islands AS (
  SELECT conv_id, turn_idx,
         SUM(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS UNBOUNDED PRECEDING) AS section_idx
  FROM flagged),
     bounds AS (
  SELECT conv_id, section_idx,
         MIN(turn_idx) AS b, MAX(turn_idx) AS e
  FROM islands GROUP BY conv_id, section_idx),
     iri AS (
  SELECT conv_id, section_idx, b, e,
         printf('{V.CONV}%s/section/%s_%02d', conv_id,
                UPPER(SUBSTR(sha256(conv_id || '#' || CAST(section_idx AS VARCHAR)),
                             1, 6)),
                CAST(section_idx AS INT)) AS sec_iri
  FROM bounds)
SELECT subj, pred, obj FROM (
  SELECT '{V.CONV}' || conv_id AS subj, '{V.PRED_HAS_SECTION}' AS pred,
         sec_iri AS obj FROM iri
  UNION ALL
  SELECT sec_iri, '{V.PRED_SECTION_INDEX}',
         '"' || CAST(section_idx AS VARCHAR) || '"^^<{V.XSD_INT}>' FROM iri
  UNION ALL
  SELECT sec_iri, '{V.PRED_BEGIN_TURN}',
         printf('{V.CONV}%s/turn/%04d', conv_id, b) FROM iri
  UNION ALL
  SELECT sec_iri, '{V.PRED_END_TURN}',
         printf('{V.CONV}%s/turn/%04d', conv_id, e) FROM iri
) u
""")
def q_kg_section_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-island triples incl. sha256 facet IRIs, engine-mirrored
    (W2/W5 + F6 all the way through)."""
    ordered = with_section_index(transcripts_from_documents(spark, sf_dir))
    return section_triples(ordered)


@register("q_kg_triples_full", None)  # trie extraction => rows-only check
def q_kg_triples_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pipeline (extract -> link -> canonicalize ->
    materialize) over documents-derived transcripts; the mention scan
    is the mapInPandas trie, which SQL can't express — the golden-
    oracle pytest gate (tests/test_pipeline.py) covers its semantics."""
    return build_triples_inmem(spark, _kg_tables(spark, sf_dir))
