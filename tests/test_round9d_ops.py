"""Round-9 fourth wave: PromQL extrapolated increase, vector-matching
binary ops, classical seasonal decomposition, and session path mining
— hand-computed goldens plus plan audits pinning the at-scale shape."""

import math

from pyspark.sql import functions as F

DAY = 86_400_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _samples(spark, rows):
    return spark.createDataFrame(
        rows, "name string, uid string, t long, value double"
    )


# ----------------------------------------------- extrapolated increase


def test_increase_golden_full_extrapolation(spark):
    """Bucket [0,100): samples (10,1),(50,4),(70,2 reset),(90,5).
    delta = 5−1+4 = 8; sampled 80, avg gap 80/3, threshold ≈29.33;
    both edge gaps are 10 < threshold so the whole [0,100) window is
    covered (the counter-zero cap 80·1/8 = 10 coincides): increase =
    8 · 100/80 = 10."""
    from v3io_tsdb_spark.operators.counters import extrapolated_increase

    df = _samples(
        spark,
        [("m", "u", 10, 1.0), ("m", "u", 50, 4.0),
         ("m", "u", 70, 2.0), ("m", "u", 90, 5.0)],
    )
    out = extrapolated_increase(df, ts_col="t", step_ms=100, from_ms=0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["count"] == 4 and r["delta"] == 8.0
    assert math.isclose(r["increase"], 10.0)


def test_increase_golden_zero_start_and_far_edges(spark):
    """Samples (40,0),(60,2): start gap 40 exceeds the 22 threshold
    BUT the zero-start cap is sampled·first/delta = 0 (counter visibly
    born at the first sample) → no start extension; end gap 40 ≥ 22 →
    half an average gap (10). increase = 2 · 30/20 = 3."""
    from v3io_tsdb_spark.operators.counters import extrapolated_increase

    df = _samples(spark, [("m", "u", 40, 0.0), ("m", "u", 60, 2.0)])
    r = extrapolated_increase(df, ts_col="t", step_ms=100, from_ms=0).collect()[0]
    assert r["delta"] == 2.0
    assert math.isclose(r["increase"], 3.0)


def test_increase_no_verdict_buckets_dropped(spark):
    """<2 samples or a zero sampled span (equal-ts pair) → no row, not
    a fabricated zero (the Prometheus <2-points rule)."""
    from v3io_tsdb_spark.operators.counters import extrapolated_increase

    df = _samples(
        spark,
        [("m", "one", 50, 1.0),
         ("m", "tie", 50, 1.0), ("m", "tie", 50, 3.0)],
    )
    assert extrapolated_increase(df, ts_col="t", step_ms=100, from_ms=0).count() == 0


def test_increase_single_exchange_no_join(spark):
    """The reset-correction window and the bucket aggregate share one
    (series, bucket) hash partitioning; extrapolation arithmetic is
    post-aggregate column algebra."""
    from v3io_tsdb_spark.operators.counters import extrapolated_increase

    df = _samples(spark, [("m", "u", 10, 1.0), ("m", "u", 50, 4.0)])
    plan = _plan(extrapolated_increase(df, ts_col="t", step_ms=100, from_ms=0))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") == 1, plan[:1200]


# ------------------------------------------------------- metric binop


def test_binop_inner_match_and_try_divide(spark):
    """error/purchase per (uid, bucket): a group missing either side is
    DROPPED (PromQL inner match); a zero denominator yields null ratio
    (no verdict) while diff still reports."""
    from v3io_tsdb_spark.operators.frames import metric_binop

    df = _samples(
        spark,
        [("error", "a", 10, 2.0), ("error", "a", 20, 4.0),
         ("purchase", "a", 30, 1.0),
         ("error", "a", 150, 9.0),          # bucket 100: error only
         ("error", "b", 10, 5.0), ("purchase", "b", 20, 0.0),
         ("view", "a", 10, 99.0)],          # other metric: filtered
    )
    out = metric_binop(
        df, left="error", right="purchase", match_cols=("uid",),
        ts_col="t", step_ms=100, from_ms=0,
    )
    rows = {(r["uid"], r["t"]): r for r in out.collect()}
    assert set(rows) == {("a", 0), ("b", 0)}
    a = rows[("a", 0)]
    assert a["avg_left"] == 3.0 and a["avg_right"] == 1.0
    assert a["ratio"] == 3.0 and a["diff"] == 2.0
    b = rows[("b", 0)]
    assert b["ratio"] is None and b["diff"] == 5.0


def test_binop_single_scan_no_self_join(spark):
    """Both vectors come out of ONE conditional aggregation: no join
    node, one partial-aggregable exchange."""
    from v3io_tsdb_spark.operators.frames import metric_binop

    df = _samples(spark, [("error", "a", 10, 2.0), ("purchase", "a", 30, 1.0)])
    plan = _plan(metric_binop(df, left="error", right="purchase",
                              match_cols=("uid",), ts_col="t", step_ms=100))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") == 1, plan[:1200]


# ------------------------------------------- seasonal decomposition


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """value = 10 + s[day%7] with s centered ([3,−1,2,0,−2,1,−3]):
    every full 7-bucket window averages to exactly 10 (trend), the
    per-phase detrended means ARE s, and residuals vanish. Edge
    half-windows give null trend/residual — no partial averages."""
    from v3io_tsdb_spark.operators.trend import seasonal_decompose

    s_pat = [3.0, -1.0, 2.0, 0.0, -2.0, 1.0, -3.0]
    rows = [("m", "u", i * DAY, 10.0 + s_pat[i % 7]) for i in range(14)]
    out = seasonal_decompose(
        _samples(spark, rows), ts_col="t", step_ms=DAY, from_ms=0, period=7
    ).collect()
    assert len(out) == 14
    by_t = {r["t"] // DAY: r for r in out}
    for i in range(14):
        r = by_t[i]
        assert math.isclose(r["seasonal"], s_pat[i % 7], abs_tol=1e-9)
        if 3 <= i <= 10:
            assert math.isclose(r["trend"], 10.0, abs_tol=1e-9)
            assert math.isclose(r["residual"], 0.0, abs_tol=1e-9)
        else:
            assert r["trend"] is None and r["residual"] is None


def test_seasonal_decompose_range_frame_is_gap_safe(spark):
    """With bucket 5 missing, every centered window that SHOULD contain
    it holds <7 buckets and yields null trend — a ROWS frame would have
    silently slid later buckets in. Only centers 9 and 10 (frames
    [6,12], [7,13]) survive."""
    from v3io_tsdb_spark.operators.trend import seasonal_decompose

    rows = [("m", "u", i * DAY, float(i)) for i in range(14) if i != 5]
    out = seasonal_decompose(
        _samples(spark, rows), ts_col="t", step_ms=DAY, from_ms=0, period=7
    ).collect()
    with_trend = sorted(r["t"] // DAY for r in out if r["trend"] is not None)
    assert with_trend == [9, 10]


def test_seasonal_decompose_broadcasts_index(spark):
    """The series×period seasonal-index table joins back as a
    broadcast — the grid is never reshuffled for it."""
    from v3io_tsdb_spark.operators.trend import seasonal_decompose

    rows = [("m", "u", i * DAY, float(i)) for i in range(14)]
    plan = _plan(seasonal_decompose(_samples(spark, rows), ts_col="t",
                                    step_ms=DAY, from_ms=0))
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan, plan[:1200]


# ------------------------------------------------- session path mining


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )


def test_path_trigrams_golden(spark):
    """User 1 walks A,B,C,D in one session → A>B>C and B>C>D (overlap
    counts); user 2's gap splits the session so no trigram spans it;
    user 3's five A's yield three overlapping A>A>A. Ranking: count
    desc, path asc."""
    from v3io_tsdb_spark.operators.paths import session_path_ngrams

    rows = (
        [(1, t, e, i) for i, (t, e) in enumerate(
            [(0, "A"), (100, "B"), (200, "C"), (300, "D")])]
        + [(2, 0, "A", 10), (2, 100, "B", 11),
           (2, 5000, "C", 12), (2, 5100, "D", 13)]
        + [(3, t * 100, "A", 20 + t) for t in range(5)]
    )
    out = session_path_ngrams(
        _events(spark, rows), gap_ms=1000, n=3, k=5
    ).collect()
    got = [(r["path"], r["occurrences"], r["rank"]) for r in out]
    assert sorted(got, key=lambda r: r[2]) == [
        ("A>A>A", 3, 1), ("A>B>C", 1, 2), ("B>C>D", 1, 3),
    ]


def test_path_trigrams_one_user_exchange_and_take_ordered(spark):
    """Sessionize and the lead windows share ONE hash partitioning on
    user (hash(user) already clusters (user, session) — only a sort is
    added); the global top-k is TakeOrdered, never a full sort. The
    only single-partition window runs on the ≤k limited rows."""
    from v3io_tsdb_spark.operators.paths import session_path_ngrams

    df = _events(spark, [(1, 0, "A", 0), (1, 100, "B", 1), (1, 200, "C", 2)])
    plan = _plan(session_path_ngrams(df, gap_ms=1000, n=3, k=5))
    assert plan.count("hashpartitioning(user_id") == 1, plan[:1500]
    assert "TakeOrdered" in plan, plan[:1500]
