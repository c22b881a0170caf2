"""Bucketed-write co-located join: the fact-fact join strategy at
100 TB — both sides pre-bucketed on the join key join WITHOUT any
exchange (SCALE.md §4)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_colocated_join_no_shuffle(spark, tmp_path):
    from v3io_tsdb_spark.datasets import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderdate")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey") \
            .mode("overwrite").saveAsTable("li_bucketed_t")
        o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey") \
            .mode("overwrite").saveAsTable("o_bucketed_t")
        # force the shuffle-join path so bucketing (not broadcast) is
        # what eliminates the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("li_bucketed_t").join(
            spark.table("o_bucketed_t"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # co-located: ZERO shuffles
        assert j.count() == li.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS o_bucketed_t")
