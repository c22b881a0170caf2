"""Unit tests for the round-6 analytic operators: counter resets/
changes, gap report, retention cohorts, fixed-width histogram, and
trailing z-score anomaly flags."""

import math

import pytest
from pyspark.sql import functions as F

H = 3_600_000
D = 24 * H
W = 7 * D


def test_counter_resets_changes(spark):
    from v3io_tsdb_spark.operators.counters import counter_resets_changes

    rows = [
        # series a: 1 2 2 1(drop) 3 on day 0; 0(drop) 5 on day 1
        ("cpu", "a", 0, 1.0), ("cpu", "a", 1, 2.0), ("cpu", "a", 2, 2.0),
        ("cpu", "a", 3, 1.0), ("cpu", "a", 4, 3.0),
        ("cpu", "a", D, 0.0), ("cpu", "a", D + 1, 5.0),
        # series b: single sample -> no predecessor, nothing counted
        ("cpu", "b", 0, 7.0),
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {
        (r["name"], r["uid"], r["t"]): r
        for r in counter_resets_changes(
            df, ts_col="t", step_ms=D, from_ms=0
        ).collect()
    }
    a0 = out[("cpu", "a", 0)]
    # drops: 2->1; changes: 1->2, 2->1, 1->3 (2->2 is not a change)
    assert a0["resets"] == 1 and a0["changes"] == 3 and a0["count"] == 5
    a1 = out[("cpu", "a", D)]
    # day-boundary crossing counts: 3->0 is day 1's reset
    assert a1["resets"] == 1 and a1["changes"] == 2 and a1["count"] == 2
    b0 = out[("cpu", "b", 0)]
    assert b0["resets"] == 0 and b0["changes"] == 0 and b0["count"] == 1


def test_gap_report(spark):
    from v3io_tsdb_spark.operators.gaps import gap_report

    rows = [
        # series a: buckets 0,1,3 present of envelope 0..3 -> 1 missing
        ("m", "a", 0), ("m", "a", H), ("m", "a", H + 1), ("m", "a", 3 * H),
        # series b: one sample -> 1 expected, 0 missing, null max gap
        ("m", "b", 5 * H),
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long")
    out = {(r["name"], r["uid"]): r
           for r in gap_report(df, ts_col="t", step_ms=H).collect()}
    a = out[("m", "a")]
    assert (a["expected"], a["present"], a["missing"]) == (4, 3, 1)
    assert a["max_gap_ms"] == 2 * H - 1
    b = out[("m", "b")]
    assert (b["expected"], b["present"], b["missing"]) == (1, 1, 0)
    assert b["max_gap_ms"] is None


def test_retention_cohorts(spark):
    from v3io_tsdb_spark.operators.cohorts import retention_cohorts

    rows = [
        # u1 cohort week 0, active weeks 0 and 2
        (1, 0), (1, 10), (1, 2 * W),
        # u2 cohort week 0, active week 0 only
        (2, W - 1),
        # u3 cohort week 1, active weeks 1 and 2
        (3, W), (3, 2 * W + 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(df).collect()}
    assert out[(0, 0)] == 2          # cohort size week 0
    assert out[(0, 2)] == 1          # u1 returned in week 2
    assert (0, 1) not in out         # nobody from cohort 0 active week 1
    assert out[(W, 0)] == 1 and out[(W, 1)] == 1


def test_fixed_width_histogram(spark):
    from v3io_tsdb_spark.functions.histogram import fixed_width_histogram

    rows = [("en", 10), ("en", 499), ("en", 500), ("de", 1200)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {(r["lang"], r["bucket_lo"]): (r["n"], r["total"])
           for r in fixed_width_histogram(df, "n_chars", 500, ("lang",)).collect()}
    assert out[("en", 0)] == (2, 509)
    assert out[("en", 500)] == (1, 500)
    assert out[("de", 1000)] == (1, 1200)
    assert len(out) == 3  # empty buckets absent


def test_bucket_zscores_trailing_window(spark):
    from v3io_tsdb_spark.operators.anomaly import bucket_zscores

    # one event per (hour, i) for i < count -> hourly counts 5,5,5,5,50
    counts = [5, 5, 5, 5, 50]
    rows = [("click", h * H + i) for h, c in enumerate(counts) for i in range(c)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    out = {r["t"]: r for r in
           bucket_zscores(df, step_ms=H, lookback=3, min_history=3).collect()}
    assert out[0]["mean"] is None and out[0]["std"] is None  # no history
    assert out[H]["std"] is None        # 1-row history: null, not NaN
    # hour 4: trailing 3 hours all 5 -> zero variance -> no verdict
    assert out[4 * H]["mean"] == 5.0 and out[4 * H]["z"] is None
    # hour 3 has 3 identical trailing values: std 0 -> null z as well
    assert out[3 * H]["z"] is None
    # non-degenerate check: counts 5,5,5,50 trailing for a 6th hour
    rows2 = rows + [("click", 5 * H + i) for i in range(5)]
    df2 = spark.createDataFrame(rows2, "event_type string, ts_ms long")
    r5 = {r["t"]: r for r in
          bucket_zscores(df2, step_ms=H, lookback=3, min_history=3).collect()}[5 * H]
    exp_mean = (5 + 5 + 50) / 3
    exp_std = math.sqrt(((5 - exp_mean) ** 2 * 2 + (50 - exp_mean) ** 2) / 2)
    assert r5["mean"] == pytest.approx(exp_mean)
    assert r5["z"] == pytest.approx((5 - exp_mean) / exp_std)


def test_ewma_closed_form_matches_recurrence(spark):
    from v3io_tsdb_spark.operators.trend import ewma_over_buckets

    xs = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3]
    alpha = 0.3
    df = spark.createDataFrame(
        [("m", "a", i, x) for i, x in enumerate(xs)],
        "name string, uid string, t long, x double",
    )
    out = {r["t"]: r["ewma"]
           for r in ewma_over_buckets(df, alpha=alpha).collect()}
    s = xs[0]
    for i, x in enumerate(xs):
        if i > 0:
            s = alpha * x + (1 - alpha) * s
        assert out[i] == pytest.approx(s, abs=1e-9)


def test_autocorr_lag1(spark):
    from v3io_tsdb_spark.operators.trend import autocorr_lag1

    # strictly increasing series -> lag-1 correlation exactly 1
    rows = [("m", "up", i, float(i)) for i in range(10)]
    # alternating series -> strong negative lag-1 correlation
    rows += [("m", "alt", i, float(1 if i % 2 else -1)) for i in range(10)]
    # two buckets -> a single pair: correlation undefined -> null
    rows += [("m", "tiny", 0, 1.0), ("m", "tiny", 1, 2.0)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    out = {r["uid"]: r for r in autocorr_lag1(df).collect()}
    assert out["up"]["autocorr"] == pytest.approx(1.0)
    assert out["alt"]["autocorr"] == pytest.approx(-1.0)
    assert out["tiny"]["autocorr"] is None
    assert out["up"]["n_buckets"] == 10


def test_distinct_count_gate(spark):
    from v3io_tsdb_spark.functions.sketches import distinct_count_gate

    rows = [(d, u) for d in range(2) for u in range(200) for _ in range(2)]
    df = spark.createDataFrame(rows, "day long, user long")
    out = {r["day"]: r for r in
           distinct_count_gate(df, "user", group_cols=("day",)).collect()}
    assert out[0]["n_exact"] == 200 and out[0]["ok"]
    assert out[1]["n_exact"] == 200 and out[1]["ok"]


def test_word_entropy(spark):
    from v3io_tsdb_spark.functions.text import word_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "A  b\ta b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in word_entropy(df).collect()}
    assert out[1]["entropy"] == pytest.approx(0.0)          # no diversity
    assert out[1]["n_distinct"] == 1 and out[1]["n_tokens"] == 4
    assert out[2]["entropy"] == pytest.approx(math.log(4))  # uniform over 4
    # lowercased + whitespace-run tokenization: {a:2, b:2}
    assert out[3]["n_distinct"] == 2 and out[3]["n_tokens"] == 4
    assert out[3]["entropy"] == pytest.approx(math.log(2))


def test_autocorr_constant_series_is_null(spark):
    """Zero-variance series: Spark's corr is NaN where SQL engines give
    NULL — the operator must normalize to null (no verdict)."""
    from v3io_tsdb_spark.operators.trend import autocorr_lag1

    rows = [("m", "const", i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    r = autocorr_lag1(df).collect()[0]
    assert r["autocorr"] is None and r["n_buckets"] == 10


def test_distinct_count_gate_all_null_group(spark):
    """ADVICE r6: a group whose key is entirely null has n_exact=0 —
    under ANSI mode a plain `/` threw DIVIDE_BY_ZERO; try_divide +
    the both-zero rule must yield (0, ok=True) instead."""
    from v3io_tsdb_spark.functions.sketches import distinct_count_gate

    rows = [(0, None), (0, None), (1, 7), (1, 8)]
    df = spark.createDataFrame(rows, "day long, user long")
    out = {r["day"]: r for r in
           distinct_count_gate(df, "user", group_cols=("day",)).collect()}
    assert out[0]["n_exact"] == 0 and out[0]["ok"] is True
    assert out[1]["n_exact"] == 2 and out[1]["ok"] is True


def test_bucket_zscores_min_history_one_no_nan(spark):
    """ADVICE r6: min_history<=1 with a single trailing bucket gave
    z=NaN (stddev over 1 row is NaN and NaN > 0 in Spark ordering);
    the guard must emit null instead."""
    from v3io_tsdb_spark.operators.anomaly import bucket_zscores

    rows = [("click", 0), ("click", H), ("click", H + 1)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    out = {r["t"]: r for r in
           bucket_zscores(df, step_ms=H, lookback=3, min_history=1).collect()}
    # bucket H has exactly 1 trailing bucket: std undefined -> null z
    assert out[H]["z"] is None
    assert not any(r is not None and isinstance(r, float) and math.isnan(r)
                   for r in (out[0]["z"], out[H]["z"]))


def test_fixed_width_histogram_float_totals_not_truncated(spark):
    """ADVICE r6: sum over a fractional value column must come back as
    an exact double, not a silently-truncated long."""
    from v3io_tsdb_spark.functions.histogram import fixed_width_histogram

    rows = [("en", 10.25), ("en", 20.5), ("de", 999.75)]
    df = spark.createDataFrame(rows, "lang string, score double")
    out = {(r["lang"], r["bucket_lo"]): r["total"]
           for r in fixed_width_histogram(df, "score", 500, ("lang",)).collect()}
    assert out[("en", 0)] == pytest.approx(30.75)
    assert out[("de", 500)] == pytest.approx(999.75)
    # and the integral-column contract is unchanged (long, exact)
    dfi = spark.createDataFrame([("en", 7), ("en", 8)], "lang string, n long")
    ri = fixed_width_histogram(dfi, "n", 500, ("lang",)).collect()[0]
    assert ri["total"] == 15 and isinstance(ri["total"], int)


def test_irate_idelta(spark):
    from v3io_tsdb_spark.operators.counters import irate_idelta

    rows = [
        # series a, bucket 0: samples at 0s,10s,30s -> last pair (10,30): dv=5, dt=20s
        ("cpu", "a", 0, 10.0), ("cpu", "a", 10_000, 15.0), ("cpu", "a", 30_000, 20.0),
        # series a, bucket 1 (day 1): single sample -> null irate/idelta
        ("cpu", "a", D + 1000, 99.0),
        # series b, bucket 0: counter reset in last pair -> negative idelta kept raw
        ("cpu", "b", 0, 100.0), ("cpu", "b", 60_000, 2.0),
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {(r["uid"], r["t"]): r
           for r in irate_idelta(df, step_ms=D).collect()}
    a0 = out[("a", 0)]
    assert a0["count"] == 3 and a0["idelta"] == 5.0
    assert a0["irate"] == pytest.approx(5.0 / 20.0)
    a1 = out[("a", D)]
    assert a1["count"] == 1 and a1["idelta"] is None and a1["irate"] is None
    b0 = out[("b", 0)]
    assert b0["idelta"] == -98.0 and b0["irate"] == pytest.approx(-98.0 / 60.0)


def test_script_profile(spark):
    from v3io_tsdb_spark.functions.text import script_profile

    rows = [
        (1, "hello world"),        # latin
        (2, "你好世界 hello"),       # han-dominant (4 han vs 5 latin -> latin wins!)
        (3, "Привет мир"),          # cyrillic
        (4, "1234 !!"),             # no profiled script
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["n_latin"] == 10
    assert out[2]["n_han"] == 4 and out[2]["n_latin"] == 5
    assert out[2]["dominant_script"] == "latin"
    assert out[3]["dominant_script"] == "cyrillic" and out[3]["n_latin"] == 0
    assert out[4]["dominant_script"] == "other" and out[4]["n_chars"] == 7
    assert out[3]["r_cyrillic"] == pytest.approx(9 / 10)
