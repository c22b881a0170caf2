"""Round-9 ninth wave: PromQL offset (week-over-week), table profile,
Kaplan-Meier survival, MMR diversified retrieval — goldens plus plan
audits."""

import math

from pyspark.sql import functions as F

DAY = 86_400_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- offset / WoW


def test_offset_compare_golden_and_gap_safety(spark):
    """Days 0..13 with day 3 MISSING: day 10's prior bucket (day 3)
    is absent, so prev/delta/pct are null — a ROWS-frame lag(7) would
    silently serve day 2 there. Day 9 compares against day 2
    normally."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    rows = [
        ("m", "u", d * DAY, float(100 + d))
        for d in range(14)
        if d != 3
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {
        r["t"] // DAY: r
        for r in offset_compare(
            df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
            from_ms=0, offset_buckets=7,
        ).collect()
    }
    assert len(out) == 13
    # day 9 ← day 2: 109 vs 102
    assert math.isclose(out[9]["prev"], 102.0)
    assert math.isclose(out[9]["delta"], 7.0)
    assert math.isclose(out[9]["pct"], 7.0 / 102.0)
    # day 10 ← missing day 3: no verdict
    assert out[10]["prev"] is None
    assert out[10]["delta"] is None
    assert out[10]["pct"] is None
    # warm-up rows (t < 7d) have no prior bucket either
    assert out[0]["prev"] is None


def test_offset_compare_zero_prev_null_pct(spark):
    """A prior value of exactly 0 defines delta but not pct (no
    ratio), matching the try_divide convention everywhere else."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("m", "u", 0, 0.0), ("m", "u", 7 * DAY, 5.0)],
        "name string, uid string, t long, value double",
    )
    out = {r["t"] // DAY: r for r in offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=7,
    ).collect()}
    assert math.isclose(out[7]["prev"], 0.0)
    assert math.isclose(out[7]["delta"], 5.0)
    assert out[7]["pct"] is None


def test_offset_compare_no_join_partial_agg_first(spark):
    """The prior value comes from a window, never a self-join, and
    the only data-sized exchange is the grid reduce, which carries
    map-side partial aggregates; the second exchange moves the
    already-reduced panel to the series-keyed window."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("m", "u", 0, 1.0)], "name string, uid string, t long, value double"
    )
    plan = _plan(offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=7,
    ))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1200]
    # map-side combine before the data-sized exchange
    assert plan.count("HashAggregate") == 2, plan[:1200]


# ------------------------------------------------------- table profile


def test_table_profile_golden_counts(spark):
    """Nulls, exact distincts, and type-split min/max/mean on a
    crafted frame: numeric columns carry min_num/max_num/mean, string
    columns carry min_str/max_str, each null on the other side."""
    from v3io_tsdb_spark.functions.profile import table_profile

    df = spark.createDataFrame(
        [(1, "b", 10.0), (2, "a", None), (2, None, 30.0)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in table_profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert out["id"]["n_rows"] == 3 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 2
    assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 2.0
    assert math.isclose(out["id"]["mean"], 5.0 / 3.0)
    assert out["id"]["min_str"] is None
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None and out["s"]["mean"] is None
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_num"] == 10.0 and out["v"]["max_num"] == 30.0


def test_table_profile_approx_mode_no_expand(spark):
    """approx=True swaps exact count(DISTINCT) for HLL: the plan must
    carry NO Expand node (the O(n_cols)x row replication the exact
    path pays), while the exact plan does."""
    from v3io_tsdb_spark.functions.profile import table_profile

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    exact_plan = _plan(table_profile(df, approx=False))
    approx_plan = _plan(table_profile(df, approx=True))
    assert "Expand" in exact_plan, exact_plan[:1200]
    assert "Expand" not in approx_plan, approx_plan[:1200]
    # approx counts are still sane on tiny exact-regime inputs
    out = {r["column"]: r["n_distinct"]
           for r in table_profile(df, approx=True).collect()}
    assert out == {"id": 1, "s": 1}


def test_table_profile_column_subset_and_unknown(spark):
    from v3io_tsdb_spark.functions.profile import table_profile
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert [r["column"] for r in table_profile(df, columns=["s"]).collect()] == ["s"]
    with pytest.raises(ValueError):
        table_profile(df, columns=["nope"])
