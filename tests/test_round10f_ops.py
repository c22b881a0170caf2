"""Round-10 wave 6 goldens: perplexity buckets, cohort revenue, CUBE
rollup, HW forecast-band anomaly."""

import math

import pytest
from pyspark.sql import functions as F

DAY = 86_400_000
WEEK = 7 * DAY


# ------------------------------------------------ perplexity buckets


def test_perplexity_buckets_per_language_terciles(spark):
    """Nine docs per language with ordered fluency: each language
    splits 3/3/3 into head/middle/tail INDEPENDENTLY (per-language
    boundaries, the CCNet rule)."""
    from v3io_tsdb_spark.functions.text import perplexity_buckets

    docs = []
    did = 0
    for lang, words in (("en", "abcdef"), ("de", "uvwxyz")):
        for i in range(9):
            # doc i repeats a common phrase (9-i) times and a rare
            # word pair i times -> monotonically less fluent
            body = (f"{words[0]} {words[1]} " * (9 - i)
                    + f"{words[2 + i % 4]} {words[3 + i % 3]} " * i)
            docs.append((did, body.strip(), lang))
            did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = perplexity_buckets(df).collect()
    for lang in ("en", "de"):
        rows = [r for r in out if r["lang"] == lang]
        counts = {b: sum(1 for r in rows if r["bucket"] == b)
                  for b in ("head", "middle", "tail")}
        assert counts == {"head": 3, "middle": 3, "tail": 3}
        # buckets are ordered by score
        hmin = min(r["mean_logprob"] for r in rows if r["bucket"] == "head")
        tmax = max(r["mean_logprob"] for r in rows if r["bucket"] == "tail")
        assert hmin > tmax


# --------------------------------------------------- cohort revenue


def test_cohort_revenue_triangle(spark):
    """u1 joins week 0 (spends 10, then 20 in week 1), u2 joins
    week 1 (spends 5): cells (0,0)=10, (0,1)=20, (1,0)=5."""
    from v3io_tsdb_spark.operators.cohorts import cohort_revenue

    rows = [(1, 0, 10.0), (1, WEEK + 5, 20.0), (2, WEEK + 9, 5.0)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    out = {(r["cohort_week"] // WEEK, r["week_offset"]): r
           for r in cohort_revenue(df).collect()}
    assert out[(0, 0)]["revenue"] == 10.0 and out[(0, 0)]["n_users"] == 1
    assert out[(0, 1)]["revenue"] == 20.0
    assert out[(1, 0)]["revenue"] == 5.0


# ------------------------------------------------------------- CUBE


def test_cube_grouping_sets_complete(spark):
    """cube(a, b) over 2x2 distinct values yields 4 + 2 + 2 + 1 rows
    with grouping_id 0/1/2/3 and a grand total matching the sum."""
    df = spark.createDataFrame(
        [("A", "X", 1.0), ("A", "Y", 2.0), ("B", "X", 4.0), ("B", "Y", 8.0)],
        "f string, s string, v double",
    )
    out = df.cube("f", "s").agg(
        F.grouping_id().alias("gid"), F.sum("v").alias("rev")
    ).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert {g: len(v) for g, v in by_gid.items()} == {0: 4, 1: 2, 2: 2, 3: 1}
    assert by_gid[3][0]["rev"] == 15.0
    assert {r["f"] for r in by_gid[1]} == {"A", "B"}  # gid 1 = s aggregated


# ------------------------------------------------------- HW anomaly


def test_hw_anomaly_seasonal_spike_flags_flat_rush_does_not(spark):
    """A 7-periodic series with one mid-week spike: the spike bucket
    is the ONLY flag — the weekly rush pattern itself never alarms
    because the model predicts it, and the spike cannot poison the
    following week because a flagged bucket updates state with its
    forecast, not the observation (filter-side rejection)."""
    from v3io_tsdb_spark.operators.trend import hw_anomaly

    tmpl = [10.0, 20.0, 15.0, 30.0, 5.0, 25.0, 35.0]
    rows = []
    for d in range(28):
        v = tmpl[d % 7] + (500.0 if d == 17 else 0.0)
        rows.append(("m", d * DAY, v))
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = {r["t"] // DAY: r for r in hw_anomaly(
        df, series_cols=("name",), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=28, period=7, k=3.0,
    ).collect()}
    flagged = sorted(d for d, r in out.items() if r["flag"] == 1)
    assert flagged == [17]
    # rejection keeps the post-spike week's forecasts clean: every
    # bucket after the spike fits the template exactly again
    assert all(out[d]["residual"] == 0.0 for d in range(18, 28))


def test_hw_anomaly_pure_seasonal_never_flags(spark):
    """The fixed-point series (zero residuals everywhere): mad = 0
    and every deviation is 0 -> flag 0, never null, never 1."""
    from v3io_tsdb_spark.operators.trend import hw_anomaly

    tmpl = [10.0, 20.0, 15.0, 30.0, 5.0, 25.0, 35.0]
    rows = [("m", d * DAY, tmpl[d % 7]) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = hw_anomaly(
        df, series_cols=("name",), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=21, period=7,
    ).collect()
    assert len(out) == 14
    assert all(r["flag"] == 0 for r in out)
    assert all(r["resid_mad"] == 0.0 for r in out)
