"""Adapters from the driver's TPC-H-ish testdata to the pipeline's
authoritative transcript shape (conv_id, turn_idx, role, text, tool, ts)
— deterministic column expressions only, so a DuckDB oracle can derive
the identical table (scripts in queries_kg.py mirror this in SQL).

documents.parquet -> transcripts: conv_id = source, turn order by
doc_id, roles in runs of two cycling user/assistant/tool, ts synthetic
from doc_id. No randomness anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    ti = (F.row_number().over(w) - 1).cast("int")
    # NB floor, not cast: double->int casts truncate in Spark but ROUND
    # in DuckDB — floor() agrees in both engines.
    pair = F.floor(ti / 2) % 3
    role = (
        F.when(pair == 0, "user")
        .when(pair == 1, "assistant")
        .otherwise("tool")
    )
    return d.select(
        F.col("source").alias("conv_id"),
        ti.alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.when(role == "tool",
               F.format_string("tool_%d", ti % 5)).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("ts"),
    )


TRANSCRIPTS_FROM_DOCUMENTS_SQL = """
SELECT source AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT)
           AS turn_idx,
       CASE CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1) / 2)
                 AS INT) % 3
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE WHEN CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1) / 2)
                      AS INT) % 3 = 2
            THEN 'tool_' || CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1) % 5
                                 AS VARCHAR)
            END AS tool,
       TIMESTAMP '2026-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
FROM documents
"""


# Vocabulary for synthesized turn text: gazetteer surfaces (fixtures.py
# BASE_SURFACES single tokens) + neutral filler, so the trie has real
# work at bench scale.
_BENCH_WORDS = (
    "spark window join scan sort batch stream shuffle partition broadcast "
    "catalyst tungsten arrow iceberg parquet schema lineage kangyur tengyur "
    "derge peking the a of to and in is on for with data row column value"
).split()


def transcripts_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-proportional transcript synthesis (600k turns at sf0.1):
    conv_id = order key, turns ordered by line number, text = 8 words
    picked by deterministic key arithmetic — ALL column expressions, so
    generation distributes with the scan instead of looping on the
    driver."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vocab = F.array(*[F.lit(w) for w in _BENCH_WORDS])
    n = len(_BENCH_WORDS)
    words = [
        F.element_at(
            vocab,
            (F.pmod(
                F.col("l_partkey") * (i * 7 + 3) + F.col("l_suppkey") * (i + 11)
                + F.col("l_linenumber") * 13 + i,
                F.lit(n),
            ) + 1).cast("int"),
        )
        for i in range(8)
    ]
    # window partitions on the conv_id COLUMN (not the raw orderkey) so
    # the downstream section window's hashpartitioning(conv_id) reuses
    # this exchange instead of re-shuffling the synthesized table
    li = li.withColumn("conv_id", F.format_string("C%08d", F.col("l_orderkey")))
    w = Window.partitionBy("conv_id").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    ti = (F.row_number().over(w) - 1).cast("int")
    pair = F.floor(ti / 2) % 3
    role = (
        F.when(pair == 0, "user")
        .when(pair == 1, "assistant")
        .otherwise("tool")
    )
    return li.select(
        "conv_id",
        ti.alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(" ", *words).alias("text"),
        F.when(role == "tool", F.format_string("tool_%d", ti % 5)).alias("tool"),
        F.col("l_shipdate").alias("ts"),
    )
