"""Dump one query's `.explain("formatted")` to a file.

    python tools/plan_one.py <query> <out_file> [sf_dir]

Used to capture the plans/r16/<q>_{before,after}.txt evidence files.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main():
    name, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-one")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    df = E.queries()[name](spark, sf)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(txt)
    print("wrote %s (%d bytes)" % (out, len(txt)))


if __name__ == "__main__":
    main()
