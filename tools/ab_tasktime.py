"""Noise-robust per-query A/B metrics: one FRESH JVM per query,
bench-identical confs, 1 cold + 3 warm noop-sink runs, reporting per
run the WALL seconds plus the Spark-measured deltas of (jobs, stages,
task run ms, task cpu ms).

Wall clock on this host swings 2-3x between identical runs (VM-level
contention), so optimization A/Bs key on the task/job numbers — they
move with the plan, not the machine (same rationale as bench.py's
queries_task_ms). Usage:

    python tools/ab_tasktime.py [sf_dir] q1 q2 ...
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-tasktime")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "4m")
    .config("spark.sql.files.openCostInBytes", "1m")
    .config("spark.sql.codegen.cache.maxEntries", "4000")
    .config("spark.ui.retainedStages", "20000")
    .config("spark.ui.retainedJobs", "20000")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def snap():
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:
        pass
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    run = cpu = 0.0
    for i in range(stages.size()):
        s = stages.apply(i)
        run += s.executorRunTime()
        cpu += s.executorCpuTime() / 1e6
    jobs = store.jobsList(None)
    return jobs.size(), stages.size(), run, cpu


import __spark_entry__ as E
fn = E.queries()[%(name)r]
out = []
for i in range(4):
    j0, s0, r0, c0 = snap()
    t0 = time.perf_counter()
    fn(spark, %(sf)r).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    j1, s1, r1, c1 = snap()
    out.append(
        dict(wall=round(wall, 3), jobs=j1 - j0, stages=s1 - s0,
             task_run_ms=round(r1 - r0), task_cpu_ms=round(c1 - c0))
    )
print("RESULT " + json.dumps(out))
"""


def main():
    args = sys.argv[1:]
    sf = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    for name in args:
        code = CHILD % {"repo": REPO, "name": name, "sf": sf}
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
        )
        line = next((l for l in r.stdout.splitlines() if l.startswith("RESULT ")), None)
        if line is None:
            print(f"{name} FAILED\n{r.stderr[-800:]}")
            continue
        import json

        runs = json.loads(line[len("RESULT "):])
        cold, warm = runs[0], runs[1:]
        min_wall = min(w["wall"] for w in warm)
        med = sorted(w["task_run_ms"] for w in warm)[1]
        medc = sorted(w["task_cpu_ms"] for w in warm)[1]
        jobs = sorted(w["jobs"] for w in warm)[1]
        stages = sorted(w["stages"] for w in warm)[1]
        print(
            f"{name} cold_wall={cold['wall']} warm_min_wall={min_wall} "
            f"warm_jobs={jobs} warm_stages={stages} "
            f"warm_task_run_ms={med} warm_task_cpu_ms={medc}"
        )


if __name__ == "__main__":
    main()
