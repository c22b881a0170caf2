"""Round-10 wave 1: ADVICE/VERDICT-r9 hardening goldens — Holt-Winters
horizon forecasting + damped trend + typed series cols, psi_drift
empty-side ANSI safety, the MMR integral-id contract."""

import math

import pytest
from pyspark.sql import functions as F

DAY = 86_400_000


# ------------------------------------------------- HW horizon / damped


def test_hw_horizon_rotates_seasonal_across_forecast(spark):
    """On the trendless 7-periodic fixed-point series, the h-step
    closed-form forecast must walk the seasonal template forward:
    step h's forecast == tmpl[(n-1+h) % 7]. Pins that the rotation
    continues across the horizon, not just to h=1 (VERDICT r9 #6)."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    tmpl = [10.0, 20.0, 15.0, 30.0, 5.0, 25.0, 35.0]
    rows = [("m", d * DAY, tmpl[d % 7]) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = sorted(holt_winters(
        df, series_cols=("name",), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=21, period=7, horizon=9,
    ).collect(), key=lambda r: r["t"])
    in_sample = [r for r in out if r["fitted"] is not None]
    extra = [r for r in out if r["fitted"] is None]
    assert len(in_sample) == 14 and len(extra) == 8  # steps 2..9
    assert in_sample[-1]["forecast"] == tmpl[21 % 7]  # h=1, legacy stamp
    for r in extra:
        d = r["t"] // DAY
        assert d >= 21 and r["x"] is None and r["residual"] is None
        assert r["forecast"] == tmpl[d % 7]
    assert {r["t"] // DAY for r in extra} == set(range(22, 30))


def test_hw_horizon_one_is_exact_legacy_shape(spark):
    """horizon=1 (the default) must produce bit-identical output to
    the r9 gated query — same rows, same columns, no extra rows."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    rows = [("m", d * DAY, float(d % 5) + 0.25 * d) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    kw = dict(series_cols=("name",), ts_col="t", value_col="value",
              step_ms=DAY, from_ms=0, n_buckets=21, period=7)
    legacy = sorted(holt_winters(df, **kw).collect(), key=lambda r: r["t"])
    h1 = sorted(holt_winters(df, horizon=1, **kw).collect(),
                key=lambda r: r["t"])
    assert [tuple(r) for r in legacy] == [tuple(r) for r in h1]
    assert len(legacy) == 14


def test_hw_damped_phi_one_is_noop_and_damping_shrinks_trend(spark):
    """phi=1.0 must be bit-identical to the classical recursion
    (x*1.0 is a float no-op); phi<1 on a pure-trend series must
    forecast BELOW the undamped straight-line extrapolation, with the
    h-step trend multiplier Σφ^i strictly below h."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    rows = [("m", d * DAY, 10.0 + 3.0 * d) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    kw = dict(series_cols=("name",), ts_col="t", value_col="value",
              step_ms=DAY, from_ms=0, n_buckets=21, period=7, horizon=5)
    classic = sorted(holt_winters(df, **kw).collect(), key=lambda r: r["t"])
    phi1 = sorted(holt_winters(df, phi=1.0, **kw).collect(),
                  key=lambda r: r["t"])
    assert [tuple(r) for r in classic] == [tuple(r) for r in phi1]
    damped = sorted(holt_winters(df, phi=0.8, **kw).collect(),
                    key=lambda r: r["t"])
    # same horizon steps; damped forecast strictly below at every step
    # beyond h=1 (the linear series has positive trend b>0)
    cl = {r["t"]: r["forecast"] for r in classic if r["forecast"] is not None}
    dp = {r["t"]: r["forecast"] for r in damped if r["forecast"] is not None}
    assert set(cl) == set(dp) and len(cl) == 5
    assert all(dp[t] < cl[t] for t in cl)


def test_hw_non_string_series_col_types(spark):
    """ADVICE r9: the applyInPandas output schema hardcoded every
    series column as string; a numeric uid must round-trip with its
    real type."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    rows = [("m", 7, d * DAY, float(10 + d % 7)) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, uid long, t long, value double")
    out = holt_winters(
        df, series_cols=("name", "uid"), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=21, period=7,
    )
    assert dict(out.dtypes)["uid"] == "bigint"
    rows_out = out.collect()
    assert len(rows_out) == 14 and all(r["uid"] == 7 for r in rows_out)


# ------------------------------------------------- psi_drift empty side


def test_psi_drift_empty_side_no_divide_by_zero(spark):
    """ADVICE r9: an empty snapshot made the window sum 0 and Spark 4
    ANSI mode threw DIVIDE_BY_ZERO; try_divide + the eps clamp now
    yields shares == eps on the empty side."""
    from v3io_tsdb_spark.functions.histogram import psi_drift

    a = spark.createDataFrame([(1.0,), (2.0,), (9.0,)], "v double")
    b = spark.createDataFrame([], "v double")
    out = psi_drift(a, b, value_col="v", width=5.0, eps=1e-4).collect()
    assert len(out) == 2  # bins 0 and 1 from side a
    for r in out:
        assert r["share_b"] == pytest.approx(1e-4)
        assert r["psi_part"] > 0  # mass present in a, eps in b
        assert math.isfinite(r["psi"])


# ------------------------------------------------- MMR id contract


def test_mmr_string_ids_rejected_up_front(spark):
    """VERDICT r9 #8: the greedy tie-break negates the id; a string-id
    corpus must raise a clear TypeError at call time, not fail mid-
    rerank (or silently reorder under a future edit)."""
    from v3io_tsdb_spark.functions.similarity import mmr_topk

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(TypeError, match="integral id"):
        mmr_topk(df, [1.0, 0.0], k=1, vec_col="embedding", id_col="vec_id")


def test_mmr_int_ids_still_work(spark):
    from v3io_tsdb_spark.functions.similarity import mmr_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = mmr_topk(df, [1.0, 0.0], k=2, lam=0.5,
                   vec_col="embedding", id_col="vec_id").collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
