"""Round-10 wave 4 goldens: PromQL subquery composition, RFM scoring,
Gini from histogram, calendar profile, stream predict_linear twin,
anti-join shape."""

import math
import os

import pytest
from pyspark.sql import functions as F

DAY = 86_400_000


# ------------------------------------------------------------- RFM


def test_rfm_golden_quartiles(spark):
    """Eight users with distinct recency/frequency/monetary ladders:
    the best user scores 444, the worst 111, and recency is
    inverted (most recent = 4)."""
    from v3io_tsdb_spark.operators.cohorts import rfm_scores

    rows = []
    for u in range(8):
        # user u: last event at day u (younger u = staler), u+1 events
        # of value 10*(u+1) each
        for i in range(u + 1):
            rows.append((u, u * DAY - i * 1000 + 1000, 10.0 * (u + 1)))
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    out = {r["user_id"]: r for r in rfm_scores(
        df, horizon_ms=8 * DAY).collect()}
    assert out[7]["rfm"] == 444  # most recent, most frequent, richest
    assert out[0]["rfm"] == 111
    assert out[7]["r_score"] == 4 and out[0]["r_score"] == 1


def test_rfm_default_horizon_anchors_at_data_max(spark):
    """horizon_ms=None (the default) anchors recency at the data's
    own max(ts): recency is non-negative by construction and the
    most recent user scores exactly 0 days (ADVICE r10 — the old
    default of 0 produced large negative day counts)."""
    from v3io_tsdb_spark.operators.cohorts import rfm_scores

    rows = [(1, 0, 1.0), (2, 2 * DAY, 1.0), (3, 5 * DAY, 1.0)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    out = {r["user_id"]: r for r in rfm_scores(df).collect()}
    assert out[3]["recency_days"] == 0.0
    assert out[2]["recency_days"] == 3.0
    assert all(r["recency_days"] >= 0.0 for r in out.values())


def test_rfm_no_window_in_plan(spark):
    """Threshold scoring, not ntile: the plan must contain no Window
    operator (the quartile boundaries come back as a broadcast)."""
    from v3io_tsdb_spark.operators.cohorts import rfm_scores

    df = spark.createDataFrame(
        [(1, 1000, 1.0), (2, 2000, 2.0)], "user_id long, ts_ms long, value double"
    )
    plan = rfm_scores(df, horizon_ms=DAY)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


# ------------------------------------------------------------ Gini


def test_gini_uniform_zero_and_extreme(spark):
    """Equal counts → G = 0; one key owning ~all mass → G near 1."""
    from v3io_tsdb_spark.functions.skew import gini_from_counts

    eq = spark.createDataFrame(
        [(u, i) for u in range(4) for i in range(5)], "k long, i long"
    )
    g0 = gini_from_counts(eq, "k").collect()[0]
    assert g0["gini"] == 0.0 and g0["n_keys"] == 4 and g0["total"] == 20

    skew = spark.createDataFrame(
        [(0, i) for i in range(97)] + [(1, 0), (2, 0), (3, 0)], "k long, i long"
    )
    g1 = gini_from_counts(skew, "k").collect()[0]
    assert g1["gini"] > 0.7


def test_gini_matches_sorted_rank_formula(spark):
    """Histogram closed-form == literal sorted-rank formula, ties
    included."""
    from v3io_tsdb_spark.functions.skew import gini_from_counts

    counts = [1, 1, 2, 3, 3, 3, 8]
    rows = [(k, i) for k, c in enumerate(counts) for i in range(c)]
    df = spark.createDataFrame(rows, "k long, i long")
    out = gini_from_counts(df, "k").collect()[0]
    xs = sorted(counts)
    n, tot = len(xs), sum(xs)
    g = (2 * sum((i + 1) * x for i, x in enumerate(xs))
         - (n + 1) * tot) / (n * tot)
    assert out["gini"] == pytest.approx(g, abs=1e-6)


# ------------------------------------------------- calendar profile


def test_calendar_profile_epoch_dow(spark):
    """Epoch day 0 (1970-01-01) was a THURSDAY: dow must be 4 with
    the (days+4)%7, 0=Sunday convention."""
    from v3io_tsdb_spark.operators.frames import calendar_profile

    rows = [("m", 0, 1.0),                    # Thu 00:00
            ("m", 3 * 86_400_000 + 3_600_000, 2.0)]  # Sun 01:00
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = {(r["dow"], r["hour"]): r for r in
           calendar_profile(df).collect()}
    assert (4, 0) in out and out[(4, 0)]["mean"] == 1.0
    assert (0, 1) in out and out[(0, 1)]["mean"] == 2.0


def test_calendar_profile_single_aggregate_plan(spark):
    from v3io_tsdb_spark.operators.frames import calendar_profile

    df = spark.createDataFrame(
        [("m", 0, 1.0)], "name string, t long, value double"
    )
    plan = calendar_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


# ------------------------------------------- stream predict_linear


def test_stream_predict_linear_matches_exact_line(tmp_path, spark):
    """x = 5 + 2d: the first closed bucket with a full 7-bucket ring
    (day 6) predicts 5 + 2*(d+3) exactly; the open last bucket never
    emits."""
    from v3io_tsdb_spark.streaming.stateful import stream_predict_linear

    rows = [(d * DAY + 50, "m", 5.0 + 2.0 * d) for d in range(10)]
    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(rows, "ts long, name string, value double") \
        .orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema("ts long, name string, value double") \
        .parquet(src)
    q = (
        stream_predict_linear(raw, step_ms=DAY, lookback=7, horizon=3,
                              from_ms=0)
        .writeStream.format("memory").queryName("pl_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = sorted(spark.sql("select * from pl_out").collect(),
                 key=lambda r: r["t"])
    assert [r["t"] // DAY for r in out] == list(range(9))  # day 9 open
    for r in out[:6]:
        assert r["slope"] is None and r["predict"] is None
    for r in out[6:]:
        d = r["t"] // DAY
        assert r["slope"] == 2.0 and r["predict"] == 5.0 + 2.0 * (d + 3)


# ------------------------------------------------------ anti-join


def test_parts_no_sales_anti_join(spark):
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B1"), (3, "B2")], "p_partkey long, p_brand string"
    )
    li = spark.createDataFrame(
        [(1,)], "l_partkey long"
    )
    out = {r["p_brand"]: r["n"] for r in part.join(
        li, F.col("p_partkey") == F.col("l_partkey"), "left_anti"
    ).groupBy("p_brand").agg(F.count("*").alias("n")).collect()}
    assert out == {"B1": 1, "B2": 1}


# -------------------------------------------------- subquery shape


def test_subquery_rate_composition(spark):
    """Hand series: hourly lasts 0, 10, 30 on day 0 → hourly rates
    (10-0)/3600 and (30-10)/3600; daily max picks the larger."""
    import sys

    sys.path.insert(0, "/root/repo")
    from v3io_tsdb_spark.querier import Querier, SelectParams
    from v3io_tsdb_spark.appender import normalize_samples

    HOUR = 3_600_000
    rows = [
        {"ts": h * HOUR + 59_000, "name": "c", "labels": {"uid": "1"},
         "value": float(v)}
        for h, v in [(0, 0), (1, 10), (2, 30)]
    ]
    s = normalize_samples(spark, rows)
    q = Querier(spark, s)
    res = q.select(SelectParams(functions="rate", step="1h",
                                group_by="uid", from_time=0,
                                to_time=3 * HOUR - 1))
    r4 = F.round(F.col("rate") + 1e-7, 4)
    out = (
        res.where(F.col("rate").isNotNull())
        .groupBy("name", "uid")
        .agg(F.max(r4).alias("max_rate"))
        .collect()
    )
    assert len(out) == 1
    assert out[0]["max_rate"] == pytest.approx(20 / 3600, abs=1e-4)
