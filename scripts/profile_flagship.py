"""Stage-level bandwidth diagnosis of the flagship KG pipeline
(round-4 method, re-run on current code): run build_triples_inmem at
two parallelism levels with uncompressed event logs, then parse
SparkListenerStageCompleted accumulables into a per-stage table of
executor CPU / run time, GC, shuffle bytes and peak memory.

CPU-seconds that inflate with core count while executors stay busy =
memory-bus contention (the round-4 signature); the top CPU stages at
the WIDE level are the next optimization targets.

Usage: python scripts/profile_flagship.py [cores ...]   (default 2 8)
Writes BENCH/profile_flagship.json and prints the table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTDIR = "/tmp/kg_profile_events"

METRICS = {
    "internal.metrics.executorCpuTime": ("cpu_s", 1e9),
    "internal.metrics.executorRunTime": ("run_s", 1e3),
    "internal.metrics.jvmGCTime": ("gc_s", 1e3),
    "internal.metrics.shuffle.write.bytesWritten": ("shuf_w_mb", 2**20),
    "internal.metrics.shuffle.read.remoteBytesRead": ("shuf_r_mb", 2**20),
    "internal.metrics.shuffle.read.localBytesRead": ("shuf_rl_mb", 2**20),
    "internal.metrics.input.bytesRead": ("input_mb", 2**20),
    "internal.metrics.peakExecutionMemory": ("peak_mem_mb", 2**20),
}


def run_level(cores: int) -> dict:
    """One flagship run at local[cores] with event logging; returns
    {wall, stages: [...]} with per-stage metric sums."""
    os.makedirs(EVENTDIR, exist_ok=True)
    from rkts_migration_spark.fixtures import fixtures_to_spark, make_fixtures
    from rkts_migration_spark.pipeline import build_triples_inmem
    from rkts_migration_spark.session import get_spark
    from scripts.scaling_bench import _prepare_input

    # replicate scaling_bench conditions exactly (shuffle partitioning
    # identical at both levels) so the diagnosis explains the BENCH
    # number, not a different configuration
    sp = int(os.environ.get("PROFILE_SHUFFLE_PARTITIONS", "64"))
    spark = get_spark(
        app_name=f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=sp,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENTDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
        },
    )
    app_id = spark.sparkContext.applicationId
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    input_dir = _prepare_input(spark, sf_dir)
    dict_tables = fixtures_to_spark(spark, make_fixtures(seed=42, n_convs=1))

    def build():
        t = dict(dict_tables)
        t["transcripts"] = spark.read.parquet(input_dir)
        return build_triples_inmem(spark, t)

    build().count()  # warm-up (JIT); its stages are excluded below
    spark.catalog.clearCache()
    t0 = time.time()
    cutoff_ms = t0 * 1000  # stages submitted before this are warm-up
    n = build().count()
    wall = time.time() - t0
    spark.stop()

    stages = []
    with open(os.path.join(EVENTDIR, app_id)) as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            info = ev["Stage Info"]
            if info.get("Submission Time", 0) < cutoff_ms:
                continue
            row = {
                "stage_id": info["Stage ID"],
                "name": info.get("Stage Name", "")[:60],
                "tasks": info.get("Number of Tasks", 0),
            }
            # first repo frame in the callsite = which operator this is
            details = info.get("Details", "")
            for ln in details.splitlines():
                if "rkts_migration_spark" in ln:
                    row["callsite"] = ln.strip()[:100]
                    break
            for acc in info.get("Accumulables", []):
                m = METRICS.get(acc.get("Name", ""))
                if m:
                    key, div = m
                    try:
                        row[key] = round(int(acc["Value"]) / div, 2)
                    except (ValueError, TypeError):
                        pass
            stages.append(row)
    return {"cores": cores, "wall_s": round(wall, 2), "triples": n,
            "t0_ms": int(cutoff_ms), "t1_ms": int((t0 + wall) * 1000),
            "app_id": app_id, "stages": stages}


def main() -> int:
    # each level in its own taskset-pinned subprocess, exactly like
    # scaling_bench: the driver/GC/python workers share the pinned set
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return 0
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    shutil.rmtree(EVENTDIR, ignore_errors=True)
    import subprocess
    lvl_results = []
    for cores in levels:
        cmd = [sys.executable, os.path.abspath(__file__), "--run", str(cores)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        lvl_results.append(json.loads(line[len("RESULT "):]))
    out = {"levels": lvl_results}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/profile_flagship.json", "w") as f:
        json.dump(out, f, indent=1)
    for lvl in out["levels"]:
        tot_cpu = sum(s.get("cpu_s", 0) for s in lvl["stages"])
        print(f"\n=== local[{lvl['cores']}] wall={lvl['wall_s']}s "
              f"total_cpu={tot_cpu:.1f}s triples={lvl['triples']} ===")
        top = sorted(lvl["stages"], key=lambda s: -s.get("cpu_s", 0))[:14]
        for s in top:
            print(f"  stage {s['stage_id']:>4} cpu={s.get('cpu_s', 0):>7.1f}s "
                  f"run={s.get('run_s', 0):>7.1f}s gc={s.get('gc_s', 0):>5.1f}s "
                  f"tasks={s['tasks']:>4} in={s.get('input_mb', 0):>7.1f}MB "
                  f"sw={s.get('shuf_w_mb', 0):>7.1f}MB  {s['name']}")
            if s.get("callsite"):
                print(f"        {s['callsite']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
