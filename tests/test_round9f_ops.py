"""Round-9 sixth wave: Benford profile, inter-arrival bot screen,
metric correlation matrix, new-vs-returning actives, PSI drift —
goldens plus plan audits."""

import math

from pyspark.sql import functions as F

DAY = 86_400_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------------------------- Benford


def test_benford_golden_hand_counts(spark):
    """Values [1.5, 19, 25, 0.5, 300, 9.9] → digits 1×2, 2×1, 3×1,
    9×1 (the 0.5 is excluded); all 9 digit rows exist, absent digits
    carry n=0 and still contribute (0−e·N)²/(e·N) = e·N to χ²."""
    from v3io_tsdb_spark.functions.histogram import benford_profile

    df = spark.createDataFrame(
        [(v,) for v in [1.5, 19.0, 25.0, 0.5, 300.0, 9.9]], "value double"
    )
    out = {r["digit"]: r for r in benford_profile(df).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n"] == 2 and out[2]["n"] == 1 and out[3]["n"] == 1
    assert out[9]["n"] == 1 and out[4]["n"] == 0
    assert math.isclose(out[1]["share"], 0.4, abs_tol=1e-12)
    assert math.isclose(out[1]["expected"], math.log10(2), abs_tol=1e-12)
    # hand chi2 over ALL digits
    N = 5
    chi = sum(
        (out[d]["n"] - math.log10(1 + 1 / d) * N) ** 2
        / (math.log10(1 + 1 / d) * N)
        for d in range(1, 10)
    )
    assert math.isclose(out[5]["chi2"], chi, rel_tol=1e-12)


def test_benford_digit_from_integer_string_not_log(spark):
    """99.9999999999999 has integer part 99 → digit 9, where a float
    log10-based extraction can round 1.9999… to 2.0 and claim digit 1.
    The string path cannot flip."""
    from v3io_tsdb_spark.functions.histogram import benford_profile

    df = spark.createDataFrame([(99.9999999999999,)], "value double")
    out = {r["digit"]: r["n"] for r in benford_profile(df).collect()}
    assert out[9] == 1 and out[1] == 0


# ------------------------------------------------------ inter-arrival


def test_interarrival_golden(spark):
    """User 1 gaps [100, 200] → mean 150, cv = 70.71/150 ≈ 0.4714,
    floor 100; user 2 has one event → dropped (no gaps, no verdict);
    user 3 metronomic [50, 50] → cv 0 (the bot signature)."""
    from v3io_tsdb_spark.operators.gaps import interarrival_stats

    rows = [(1, 0, 0), (1, 100, 1), (1, 300, 2),
            (2, 0, 3),
            (3, 0, 4), (3, 50, 5), (3, 100, 6)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_id long")
    out = {r["user_id"]: r for r in
           interarrival_stats(df, "user_id", "ts_ms", "event_id").collect()}
    assert set(out) == {1, 3}
    r1 = out[1]
    assert r1["n_gaps"] == 2 and r1["mean_gap_ms"] == 150.0
    assert math.isclose(r1["cv_gap"], math.sqrt(5000) / 150, rel_tol=1e-12)
    assert r1["min_gap_ms"] == 100
    assert out[3]["cv_gap"] == 0.0


def test_interarrival_single_exchange(spark):
    """Lag window and per-key aggregate share one user hash partition;
    no join."""
    from v3io_tsdb_spark.operators.gaps import interarrival_stats

    df = spark.createDataFrame(
        [(1, 0, 0), (1, 5, 1)], "user_id long, ts_ms long, event_id long"
    )
    plan = _plan(interarrival_stats(df, "user_id", "ts_ms", "event_id"))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") == 1, plan[:1200]


# ------------------------------------------------- correlation matrix


def test_corr_matrix_golden_anticorrelated(spark):
    """m1 = [1,2,3], m2 = [6,4,2] on aligned buckets: corr(m1,m2) = −1
    exactly; the diagonal self-rows carry corr 1; n_buckets = 3."""
    from v3io_tsdb_spark.operators.trend import metric_corr_matrix

    rows = [("m1", "u", i * 100, float(i + 1)) for i in range(3)] + [
        ("m2", "u", i * 100, float(6 - 2 * i)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {(r["name_a"], r["name_b"]): r for r in
           metric_corr_matrix(df, ts_col="t", step_ms=100, from_ms=0).collect()}
    assert set(out) == {("m1", "m1"), ("m1", "m2"), ("m2", "m2")}
    assert math.isclose(out[("m1", "m2")]["corr"], -1.0, abs_tol=1e-12)
    assert math.isclose(out[("m1", "m1")]["corr"], 1.0, abs_tol=1e-12)
    assert out[("m1", "m2")]["n_buckets"] == 3


def test_corr_matrix_inner_match_per_pair(spark):
    """A bucket where only one metric has data contributes to no pair
    row (the metric_binop inner-match rule): m1 on buckets {0,1,2},
    m2 on {1,2,3} → the (m1,m2) pair sees 2 buckets."""
    from v3io_tsdb_spark.operators.trend import metric_corr_matrix

    rows = [("m1", "u", i * 100, float(i)) for i in (0, 1, 2)] + [
        ("m2", "u", i * 100, float(i * i)) for i in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {(r["name_a"], r["name_b"]): r for r in
           metric_corr_matrix(df, ts_col="t", step_ms=100, from_ms=0).collect()}
    assert out[("m1", "m2")]["n_buckets"] == 2


def test_corr_matrix_join_is_post_aggregate(spark):
    """The pair join's inputs are the bucket-mean grids (panel-sized),
    never raw rows: both join children contain an aggregate, and there
    is no cartesian product (equi-join on the bucket key)."""
    from v3io_tsdb_spark.operators.trend import metric_corr_matrix

    rows = [("m1", "u", 0, 1.0), ("m2", "u", 0, 2.0)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    plan = _plan(metric_corr_matrix(df, ts_col="t", step_ms=100))
    assert "CartesianProduct" not in plan, plan[:1200]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1200]


# --------------------------------------------------- new vs returning


def test_new_vs_returning_golden(spark):
    """u1 active days {0,1}, u2 {1}, u3 {0,2} → day0 (2 active, both
    new), day1 (2 active, 1 new), day2 (1 active, 0 new). Multiple
    events per (user, day) count once."""
    from v3io_tsdb_spark.operators.cohorts import new_vs_returning

    rows = [(1, 10), (1, 20), (1, DAY + 5),
            (2, DAY + 1),
            (3, 30), (3, 2 * DAY + 7)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r["t"] // DAY: r for r in
           new_vs_returning(df, "user_id", "ts_ms", DAY).collect()}
    assert (out[0]["active"], out[0]["new"], out[0]["returning"]) == (2, 2, 0)
    assert (out[1]["active"], out[1]["new"], out[1]["returning"]) == (2, 1, 1)
    assert (out[2]["active"], out[2]["new"], out[2]["returning"]) == (1, 0, 1)


def test_new_vs_returning_no_self_join(spark):
    """First-seen comes from a min window over the distinct (user,day)
    reduction — never a self-join of the events."""
    from v3io_tsdb_spark.operators.cohorts import new_vs_returning

    df = spark.createDataFrame([(1, 10)], "user_id long, ts_ms long")
    plan = _plan(new_vs_returning(df, "user_id", "ts_ms", DAY))
    assert "Join" not in plan, plan[:800]


# ----------------------------------------------------------- PSI


def test_psi_golden_symmetric_shift(spark):
    """A = 3×bin0 + 1×bin1, B = 1×bin0 + 3×bin1: shares swap 0.75/0.25
    → psi = 2 · 0.5·ln(3) = ln 3 ≈ 1.0986 (the 'shifted' verdict,
    > 0.25)."""
    from v3io_tsdb_spark.functions.histogram import psi_drift

    a = spark.createDataFrame([(50,)] * 3 + [(150,)], "v long")
    b = spark.createDataFrame([(50,)] + [(150,)] * 3, "v long")
    out = psi_drift(a, b, "v", width=100.0).collect()
    by_bin = {r["bin"]: r for r in out}
    assert math.isclose(by_bin[0]["share_a"], 0.75, abs_tol=1e-12)
    assert math.isclose(by_bin[0]["share_b"], 0.25, abs_tol=1e-12)
    for r in out:
        assert math.isclose(r["psi"], math.log(3), rel_tol=1e-12)


def test_psi_one_sided_bin_clamps(spark):
    """A bin present only in B: A's share clamps to eps=1e-6 instead
    of exploding the log; psi stays finite and the one-sided bin
    dominates it."""
    from v3io_tsdb_spark.functions.histogram import psi_drift

    a = spark.createDataFrame([(50,)] * 4, "v long")
    b = spark.createDataFrame([(50,)] * 2 + [(250,)] * 2, "v long")
    out = {r["bin"]: r for r in psi_drift(a, b, "v", width=100.0).collect()}
    r2 = out[2]
    assert r2["share_a"] == 1e-6 and r2["share_b"] == 0.5
    assert math.isfinite(r2["psi"]) and r2["psi_part"] > 5
