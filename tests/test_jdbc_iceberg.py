"""S8 JDBC source against embedded Derby (the one JDBC engine in the
sandbox's Spark jars) + the Iceberg branch wiring of the stage-table
layer (no Iceberg runtime jar here, so the branch is exercised via a
mocked probe: the write must ATTEMPT the Iceberg source and must NOT
commit a manifest when it fails — the atomic-commit contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rkts_migration_spark.sources.jdbc import (
    DERBY_DRIVER,
    read_jdbc_table,
    write_jdbc_table,
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip_partitioned(spark, derby_url):
    src = spark.range(0, 200).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
    )
    write_jdbc_table(src, derby_url, "people")

    back = read_jdbc_table(
        spark, derby_url, "people",
        partition_column="id", lower_bound=0, upper_bound=200,
        num_partitions=4,
    )
    # the partitioned read must fan out into one range query per split
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
    assert (
        back.agg(F.sum("id")).collect()[0][0]
        == src.agg(F.sum("id")).collect()[0][0]
    )

    # predicate pushdown reaches the remote SQL (the anti-N+1 shape:
    # the filter runs in the database, not after a full transfer)
    filtered = back.filter(F.col("id") < 50)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan
    assert filtered.count() == 50


def test_jdbc_single_partition_dimension(spark, derby_url):
    dim = read_jdbc_table(spark, derby_url, "people")
    assert dim.rdd.getNumPartitions() == 1
    assert dim.count() == 200


def test_write_stage_iceberg_branch_attempted(spark, tmpdir_ckpt, monkeypatch):
    from rkts_migration_spark.sources import tables as T

    df = spark.range(0, 10).select(F.col("id"), (F.col("id") % 2).alias("p"))
    monkeypatch.setattr(T, "_has_iceberg", lambda _s: True)
    with pytest.raises(Exception, match="(?i)iceberg|data source"):
        T.write_stage(df, tmpdir_ckpt, "stg", run_id="r1")
    # atomic-commit contract: a failed Iceberg write must leave NO
    # committed manifest, so resume never trusts a partial stage
    assert not T.stage_is_complete(tmpdir_ckpt, "stg")


def test_read_stage_iceberg_probe_falls_back(spark, tmpdir_ckpt, monkeypatch):
    from rkts_migration_spark.sources import tables as T

    df = spark.range(0, 10).select(F.col("id"))
    T.write_stage(df, tmpdir_ckpt, "stg", run_id="r1")  # parquet fallback
    monkeypatch.setattr(T, "_has_iceberg", lambda _s: True)
    # probe says iceberg, load fails (no jar) -> parquet fallback reads
    # the committed stage anyway
    got = T.read_stage(spark, tmpdir_ckpt, "stg")
    assert got.count() == 10
    assert os.path.exists(os.path.join(tmpdir_ckpt, "stg", T.MANIFEST))
