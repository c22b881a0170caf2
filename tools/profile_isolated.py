"""Isolated per-query profiling: one FRESH JVM per query, bench-
identical Spark confs, cold + 2 warm runs through the noop sink.

Separates real plan cost from bench-session run-order effects (GC
tax, codegen-cache pressure from 50+ preceding queries). Usage:

    python tools/profile_isolated.py [sf_dir] q1 q2 ...

Each query runs in a subprocess; the parent prints one line per query:
``name cold warm1 warm2``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-isolated")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "4m")
    .config("spark.sql.files.openCostInBytes", "1m")
    .config("spark.sql.codegen.cache.maxEntries", "4000")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
fn = E.queries()[%(name)r]
out = []
for _ in range(3):
    t0 = time.perf_counter()
    fn(spark, %(sf)r).write.format("noop").mode("overwrite").save()
    out.append(round(time.perf_counter() - t0, 3))
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
            print(f"{name} FAILED\n{r.stderr[-500:]}")
            continue
        cold, w1, w2 = json.loads(line[len("RESULT "):])
        print(f"{name} cold={cold} warm1={w1} warm2={w2}")


if __name__ == "__main__":
    main()
