"""Round-10 wave 3 goldens: stream_drawdown twin, Q4/Q12 join shapes,
DAU/WAU rolling distinct, Kneser-Ney bigram scoring."""

import math
import os

import pytest
from pyspark.sql import functions as F

DAY = 86_400_000


# ------------------------------------------------- stream drawdown


def _run_stream(spark, tmp_path, rows, step_ms=DAY):
    from v3io_tsdb_spark.streaming.stateful import stream_drawdown

    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(rows, "ts long, name string, value double") \
        .orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema("ts long, name string, value double") \
        .parquet(src)
    q = (
        stream_drawdown(raw, step_ms=step_ms)
        .writeStream.format("memory").queryName("dd_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dd_out").collect()
    spark.catalog.dropTempView("dd_out") if spark.catalog.tableExists("dd_out") else None
    return sorted(out, key=lambda r: (r["series_key"], r["t"]))


def test_stream_drawdown_matches_batch_prefix(tmp_path, spark):
    """Buckets 10, 8, 12, 6 with the last bucket open: the stream
    emits the first three closed buckets with batch-identical
    peak/dd/max_dd."""
    rows = [(d * DAY + 100, "m", v)
            for d, v in enumerate([10.0, 8.0, 12.0, 6.0])]
    out = _run_stream(spark, tmp_path, rows)
    assert [r["t"] // DAY for r in out] == [0, 1, 2]
    assert [r["x"] for r in out] == [10.0, 8.0, 12.0]
    assert [r["peak"] for r in out] == [10.0, 10.0, 12.0]
    assert [r["dd"] for r in out] == [0.0, 0.2, 0.0]
    assert [r["max_dd"] for r in out] == [0.0, 0.2, 0.2]


def test_stream_drawdown_nonpositive_peak_null_dd(tmp_path, spark):
    rows = [(0 * DAY, "m", -4.0), (1 * DAY, "m", 2.0), (2 * DAY, "m", 1.0)]
    out = _run_stream(spark, tmp_path, rows)
    assert out[0]["dd"] is None and out[0]["max_dd"] is None
    assert out[1]["dd"] == 0.0


# ---------------------------------------------------- Q4/Q12 shapes


def test_q4_semi_join_counts_order_once(spark):
    """An order with THREE late lines counts once (EXISTS, not join
    fan-out); an order with only on-time lines does not count."""
    orders = spark.createDataFrame(
        [(1, "1-URGENT", "1996-02-01"), (2, "3-MEDIUM", "1996-02-10")],
        "o_orderkey long, o_orderpriority string, o_d string",
    ).select("o_orderkey", "o_orderpriority",
             F.col("o_d").cast("timestamp_ntz").alias("o_orderdate"))
    li = spark.createDataFrame(
        [(1, "1996-06-01"), (1, "1996-07-01"), (1, "1996-08-01"),
         (2, "1996-02-20")],
        "l_orderkey long, l_d string",
    ).select("l_orderkey", F.col("l_d").cast("timestamp_ntz").alias("l_shipdate"))
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    ).groupBy("o_orderpriority").count().collect()
    assert {(r["o_orderpriority"], r["count"]) for r in late} == {("1-URGENT", 1)}


def test_q4_plan_is_semi_join(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    plan = E.queries()["tpch_q4_priority"](spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


# -------------------------------------------------------- DAU/WAU


def test_dau_wau_golden(spark):
    """u1 active days 0,1; u2 active day 0 only: DAU = 2,1; WAU on
    day 1 still counts u2 (active within trailing 7); stickiness =
    dau/wau."""
    from v3io_tsdb_spark.operators.cohorts import active_users_rolling

    rows = [(1, 0 * DAY + 5), (1, 1 * DAY + 5), (2, 0 * DAY + 9),
            (1, 0 * DAY + 7)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r["t"] // DAY: r for r in active_users_rolling(df).collect()}
    assert out[0]["dau"] == 2 and out[0]["wau"] == 2
    assert out[1]["dau"] == 1 and out[1]["wau"] == 2
    assert out[1]["stickiness"] == 0.5


def test_wau_window_expires_after_seven_days(spark):
    """A user active only on day 0 leaves the WAU window on day 7."""
    from v3io_tsdb_spark.operators.cohorts import active_users_rolling

    rows = [(1, 0), (2, 0), (2, 7 * DAY)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r["t"] // DAY: r for r in active_users_rolling(df).collect()}
    # day 7: u1's day-0 activity contributes to days 0..6 only
    assert out[7]["wau"] == 1 and out[7]["dau"] == 1
    assert out[0]["wau"] == 2


def test_wau_counts_multi_day_user_once(spark):
    from v3io_tsdb_spark.operators.cohorts import active_users_rolling

    rows = [(1, d * DAY) for d in range(5)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r["t"] // DAY: r for r in active_users_rolling(df).collect()}
    assert all(out[d]["wau"] == 1 for d in range(5))


# ------------------------------------------------------ Kneser-Ney


def test_kn_continuation_correction(spark):
    """The San-Francisco property: 'b' and 'c' follow 'z' equally
    often, but 'b' appears after MANY distinct contexts while 'c'
    only ever follows 'z' — for an unseen-ish (low count) bigram the
    KN backoff scores the versatile continuation higher. Here both
    (z,b) and (z,c) have count 1 and the same context total, so the
    discounted first term ties and the continuation term decides:
    p_kn(b|z) > p_kn(c|z)."""
    from v3io_tsdb_spark.functions.text import kn_bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "a b"), (2, "d b"), (3, "e b"), (4, "f b"),
            (5, "z b"), (6, "z c"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["mean_logprob"] for r in
           kn_bigram_logprob(docs).collect()}
    assert out[5] > out[6]  # ln p(b|z) > ln p(c|z)


def test_kn_hand_computed(spark):
    """Corpus 'a b', 'a b': one distinct bigram, c=2, ctx=2,
    N1+(a·)=1, N1+(·b)=1, B=1 → p = (2-.75)/2 + .75·(1/2)·(1/1)
    = 0.625 + 0.375 = 1.0, ln p = 0."""
    from v3io_tsdb_spark.functions.text import kn_bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = kn_bigram_logprob(docs).collect()
    assert all(r["mean_logprob"] == 0.0 for r in out)
    assert all(r["n_bigrams"] == 1 for r in out)


def test_kn_single_token_docs_drop(spark):
    from v3io_tsdb_spark.functions.text import kn_bigram_logprob

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    out = kn_bigram_logprob(docs).collect()
    assert [r["doc_id"] for r in out] == [2]
