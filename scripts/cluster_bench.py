"""TRUE multi-executor scaling evidence: a Spark standalone cluster on
this box (separate master, worker and executor JVMs, cross-executor
shuffle) running the KG pipeline at N and 4N executors of 2 cores
each — the closest this sandbox gets to the north-rule's
"multi-executor cluster at two cluster sizes".

Usage:
    python scripts/cluster_bench.py up            # start master + worker
    python scripts/cluster_bench.py run [N 4N]    # measure both levels
    python scripts/cluster_bench.py down          # stop the daemons

`run` defaults to 1 -> 4 executors (2 -> 8 cores: both levels below
the box's memory-bandwidth knee, see BENCH/BASELINE.md) and appends
the result to BENCH/cluster_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER_URL = "spark://127.0.0.1:7077"
CORES_PER_EXEC = 2
TRIALS = int(os.environ.get("CLUSTER_TRIALS", "4"))


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _spark_class(cls: str, *args: str, log: str) -> None:
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    with open(log, "w") as f:
        subprocess.Popen(
            [os.path.join(_spark_home(), "bin", "spark-class"), cls, *args],
            stdout=f, stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        )


def up() -> None:
    _spark_class(
        "org.apache.spark.deploy.master.Master",
        "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8089",
        log="/tmp/spark-master.log")
    time.sleep(10)
    _spark_class(
        "org.apache.spark.deploy.worker.Worker",
        "-h", "127.0.0.1", "-c", "32", "-m", "64g",
        "--webui-port", "8090", MASTER_URL,
        log="/tmp/spark-worker.log")
    time.sleep(10)
    print("cluster up:", MASTER_URL)


def down() -> None:
    subprocess.run(["pkill", "-f", "deploy.worker.Worker"], check=False)
    subprocess.run(["pkill", "-f", "deploy.master.Master"], check=False)
    print("cluster down")


def run_level(n_exec: int) -> dict:
    from pyspark.sql import SparkSession

    subprocess.run(
        ["zip", "-qr", "/tmp/kg_pkg.zip", "rkts_migration_spark"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True)
    spark = (
        SparkSession.builder.appName(f"kg-cluster-{n_exec}x")
        .master(MASTER_URL)
        .config("spark.executor.cores", str(CORES_PER_EXEC))
        .config("spark.cores.max", str(CORES_PER_EXEC * n_exec))
        .config("spark.executor.memory", "5g")
        .config("spark.submit.pyFiles", "/tmp/kg_pkg.zip")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # same exclusion as session.get_spark: the inferred Generate
        # filter triples the extraction-regex evaluations (see there)
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from rkts_migration_spark.fixtures import fixtures_to_spark, make_fixtures
    from rkts_migration_spark.pipeline import build_triples_inmem
    from scripts.scaling_bench import _prepare_input

    input_dir = _prepare_input(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    dict_tables = fixtures_to_spark(spark, make_fixtures(seed=42, n_convs=1))

    def build():
        t = dict(dict_tables)
        t["transcripts"] = spark.read.parquet(input_dir)
        return build_triples_inmem(spark, t)

    def _steal_cs() -> int:
        # /proc/stat cumulative hypervisor-steal centiseconds: per-trial
        # interference evidence (same sampling as scripts/scaling_bench.py)
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    build().count()  # warm-up (JIT per executor JVM)
    walls, steals, n = [], [], 0
    for _ in range(TRIALS):
        spark.catalog.clearCache()
        s0 = _steal_cs()
        t0 = time.time()
        n = build().count()
        walls.append(round(time.time() - t0, 3))
        steals.append(_steal_cs() - s0)
    spark.stop()
    wall = min(walls)
    return {"executors": n_exec, "cores_per_executor": CORES_PER_EXEC,
            "triples": n, "wall_sec": wall, "all_walls": walls,
            "all_steal_cs": steals,
            "min_trial_steal_cs": steals[walls.index(wall)],
            "triples_per_sec": round(n / wall, 1)}


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "up":
        up()
        return 0
    if cmd == "down":
        down()
        return 0
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n_small
    small = run_level(n_small)
    big = run_level(n_big)
    eff = (big["triples_per_sec"] / small["triples_per_sec"]) / (
        n_big / n_small)
    summary = {"metric": "cluster_scaling_efficiency",
               "value": round(eff, 3), "unit": "ratio",
               "n_small": small, "n_big": big}
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cluster_scaling.json", "w") as f:
        json.dump(summary, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
