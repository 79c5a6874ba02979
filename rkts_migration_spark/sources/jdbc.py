"""JDBC source (S8).

The reference pulls catalog rows from MySQL one query per id
(/root/reference/sqltoxml.py:14-20 connection, :96-99 per-id SELECT —
the N+1 pattern). The distributed form is a SINGLE partitioned JDBC
scan: Spark splits the table into numPartitions range predicates on
partition_column, each executor opens its own connection, and filters
/ projections push down into the remote SQL (visible as PushedFilters
in the scan node). The join that replaced the per-id loop is
q_shuffle_join (J12).

Tested in-sandbox against embedded Apache Derby (the only JDBC engine
shipped with Spark's jars) — tests/test_jdbc.py round-trips a table
and asserts the partitioned read really produces one partition per
range split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Partitioned JDBC scan. With a partition_column + bounds, Spark
    issues num_partitions parallel range queries (the at-scale shape:
    never one connection streaming the whole table through the
    driver); without, a single-partition read for small dimensions."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame, url: str, table: str, driver: str = DERBY_DRIVER,
    mode: str = "overwrite",
) -> None:
    """JDBC sink counterpart (each partition writes over its own
    connection; batched inserts)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )
