"""M4+M5: cross-series (_all), windowed aggregation, downsample, group-by.

Goldens: FIXTURES.md §2 (ts_cross), §3 (ts_window), §4 (ts_downsample),
§7 (ts_groupby) — distilled from the reference integration suites.
"""

import pytest
from conftest import MIN, T0, rows_to_dict

from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.querier import Querier, SelectParams


def test_cross_series_fixture(spark, make_samples):
    # ref: cross_series_aggregation_integration_test.go:46-110
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (2 * MIN, 20), (4 * MIN, 30)]),
            ("cpu", {"os": "mac"}, [(0, 20), (2 * MIN, 30), (4 * MIN, 40)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", functions="sum_all,min_all,avg_all", step="2m", from_time=T0, to_time=T0 + 5 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["sum", "min", "avg"])
    assert got == {
        T0: (30.0, 10.0, 15.0),
        T0 + 2 * MIN: (50.0, 20.0, 25.0),
        T0 + 4 * MIN: (70.0, 30.0, 35.0),
    }


def test_windowed_aggregation_fixture(spark, make_samples):
    # ref: windowed_aggregation_integration_test.go:45-108
    df = make_samples([("cpu", {"os": "linux"}, [(i * MIN, 10 * i) for i in range(10)])])
    q = Querier(spark, df)
    res = q.select(
        SelectParams(
            name="cpu", functions="sum", step="5m", aggregation_window="6m",
            from_time=T0, to_time=T0 + 10 * MIN,
        )
    )
    got = rows_to_dict(res, ["t"], ["sum"])
    assert got == {T0: 0.0, T0 + 5 * MIN: 150.0, T0 + 10 * MIN: 390.0}


def test_windowed_smaller_than_step(spark, make_samples):
    # window < step: bucket covers [b-w, b] only
    df = make_samples([("cpu", {}, [(i * MIN, 10 * i) for i in range(10)])])
    q = Querier(spark, df)
    res = q.select(
        SelectParams(
            name="cpu", functions="sum", step="5m", aggregation_window="2m",
            from_time=T0, to_time=T0 + 10 * MIN,
        )
    )
    got = rows_to_dict(res, ["t"], ["sum"])
    # bucket T0: [T0-2m, T0] → i=0 → 0; T0+5m: i∈{3,4,5} → 120; T0+10m: i∈{8,9} → 170
    assert got == {T0: 0.0, T0 + 5 * MIN: 120.0, T0 + 10 * MIN: 170.0}


def test_downsample_fixture(spark, make_samples):
    # ref: downsample_query_integration_test.go:45-110; default interp
    # next_val with tolerance 2×step
    df = make_samples([("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20), (6 * MIN, 30), (9 * MIN, 40)])])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", step="2m", from_time=T0, to_time=T0 + 10 * MIN))
    got = rows_to_dict(res, ["t"], ["value"])
    assert got == {
        T0: 10.0,            # exact
        T0 + 2 * MIN: 30.0,  # next at 6m, gap 4m == tol
        T0 + 4 * MIN: 30.0,
        T0 + 6 * MIN: 30.0,  # exact
        T0 + 8 * MIN: 40.0,  # next at 9m
        # T0+10m omitted: no next sample (Seek fails)
    }


def test_downsample_prev_val(spark, make_samples):
    df = make_samples([("cpu", {}, [(0, 10), (6 * MIN, 30)])])
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", step="2m", interpolator="prev_val", from_time=T0, to_time=T0 + 6 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["value"])
    # 2m,4m → prev=T0 within tol 4m; 6m exact
    assert got == {T0: 10.0, T0 + 2 * MIN: 10.0, T0 + 4 * MIN: 10.0, T0 + 6 * MIN: 30.0}


def test_downsample_linear(spark, make_samples):
    df = make_samples([("cpu", {}, [(0, 10), (4 * MIN, 30)])])
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", step="2m", interpolator="linear", from_time=T0, to_time=T0 + 4 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["value"])
    assert got == {T0: 10.0, T0 + 2 * MIN: 20.0, T0 + 4 * MIN: 30.0}


def test_group_by_labels(spark, make_samples):
    # ref: query_sql_integration_test.go:48-199; FIXTURES §7
    df = make_samples(
        [
            ("cpu", {"os": "linux", "region": "europe"}, [(0, 10), (1 * MIN, 20)]),
            ("cpu", {"os": "linux", "region": "asia"}, [(0, 30), (1 * MIN, 40)]),
            ("cpu", {"os": "mac", "region": "europe"}, [(0, 50), (1 * MIN, 60)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", functions="sum", group_by="os", from_time=T0, to_time=T0 + 10 * MIN)
    )
    got = rows_to_dict(res, ["os"], ["sum"])
    assert got == {"linux": 100.0, "mac": 110.0}

    res2 = q.select(
        SelectParams(name="cpu", functions="sum", group_by="os,region", from_time=T0, to_time=T0 + 10 * MIN)
    )
    got2 = rows_to_dict(res2, ["os", "region"], ["sum"])
    assert got2 == {("linux", "europe"): 30.0, ("linux", "asia"): 70.0, ("mac", "europe"): 110.0}


def test_group_by_missing_label_errors(spark, make_samples):
    df = make_samples([("cpu", {"os": "linux"}, [(0, 10)])])
    q = Querier(spark, df)
    with pytest.raises(BadRequest):
        q.select(
            SelectParams(name="cpu", functions="sum", group_by="nosuch", from_time=T0, to_time=T0 + MIN)
        )


def test_sessionize_gap_semantics(spark):
    """Adjacency merges (delta == gap → same session), strict excess
    splits; session_end = last event + gap."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [("cpu", 0, 1.0), ("cpu", 60_000, 2.0), ("cpu", 121_000, 4.0),
         ("mem", 0, 8.0)],
        "name string, ts long, value double",
    )
    out = {(r["name"], r["session_start"]): r
           for r in sessionize(df, "1m", group_cols=("name",)).collect()}
    s1 = out[("cpu", 0)]
    assert s1["session_end"] == 121_000 - 1_000  # last(60s) + 60s gap
    assert s1["n_events"] == 2 and s1["sum_value"] == 3.0
    s2 = out[("cpu", 121_000)]
    assert s2["session_end"] == 181_000 and s2["n_events"] == 1
    assert out[("mem", 0)]["session_end"] == 60_000


def test_cross_series_interpolation_over_tolerance(spark, make_samples):
    # ref: cross_series_aggregation_integration_test.go:471-537 — a
    # series whose previous point is older than the interpolation
    # tolerance drops out of the cross-series aggregate at that step
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20), (10 * MIN, 30)]),
            ("cpu", {"os": "mac"}, [(0, 20), (5 * MIN, 30), (10 * MIN, 40)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(
            name="cpu", functions="sum_all,min_all,max_all", step="5m",
            interpolator="prev_val", tolerance=MIN,
            from_time=T0, to_time=T0 + 10 * MIN,
        )
    )
    got = rows_to_dict(res, ["t"], ["sum", "min", "max"])
    # at T0+5m linux's prev point (T0+1m) is 4m old > 1m tolerance →
    # only mac contributes
    assert got == {
        T0: (30.0, 10.0, 20.0),
        T0 + 5 * MIN: (30.0, 30.0, 30.0),
        T0 + 10 * MIN: (70.0, 30.0, 40.0),
    }


def test_cross_series_same_label_multiple_metrics(spark, make_samples):
    # ref: cross_series_aggregation_integration_test.go:654-722 —
    # cross-series aggregates stay per-metric when several metrics are
    # requested together
    d1 = [(0, 10), (1 * MIN, 1), (2 * MIN, 20), (3 * MIN, 1), (4 * MIN, 30)]
    d2 = [(0, 20), (1 * MIN, 1), (2 * MIN, 30), (3 * MIN, 1), (4 * MIN, 40)]
    df = make_samples(
        [("cpu", {"os": "linux"}, d1), ("disk", {"os": "linux"}, d2)]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu,disk", functions="sum_all", step="2m",
                     from_time=T0, to_time=T0 + 5 * MIN)
    )
    got = rows_to_dict(res, ["name", "t"], ["sum"])
    assert got == {
        ("cpu", T0): 10.0, ("cpu", T0 + 2 * MIN): 20.0, ("cpu", T0 + 4 * MIN): 30.0,
        ("disk", T0): 20.0, ("disk", T0 + 2 * MIN): 30.0, ("disk", T0 + 4 * MIN): 40.0,
    }


def test_windowed_aggregation_window_equal_to_step(spark, make_samples):
    # ref: windowed_aggregation_integration_test.go:173-236 — window ==
    # step degenerates to tumbling buckets over (b-w, b]
    df = make_samples([("cpu", {"os": "linux"}, [(i * MIN, 10 * i) for i in range(10)])])
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", functions="sum", step="5m", aggregation_window="5m",
                     from_time=T0, to_time=T0 + 10 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["sum"])
    assert got == {T0: 0.0, T0 + 5 * MIN: 150.0, T0 + 10 * MIN: 300.0}


def test_downsample_big_gaps_golden(spark, make_samples):
    """Mirror of TestSelectDataframeDaownsampleMetricsHaveBigGaps (ref:
    pqueriertest/dataframe_query_integration_test.go:517-598): two
    sparse metrics downsampled at 1m — the wide frame's time index is
    the union of each metric's non-empty cells (next_val inside the
    default tolerance), absent cells NaN. Times and values match the
    reference's expected table verbatim."""
    import math

    from v3io_tsdb_spark.sql.parser import run_sql

    DAY = 86_400_000
    df = make_samples(
        [("cpu1", {"os": "linux"}, [(-7 * DAY, 10), (-4 * DAY, 20)]),
         ("cpu2", {"os": "linux"}, [(-1 * DAY, 30)])]
    )
    q = Querier(spark, df)
    wide = run_sql(q, "select cpu1, cpu2 from tsdb",
                   step="1m", from_time=T0 - 7 * DAY, to_time=T0)
    rows = {r["t"]: (r["cpu1"], r["cpu2"]) for r in wide.collect()}
    nan = float("nan")
    expected = {
        T0 - 7 * DAY: (10.0, nan),
        T0 - 4 * DAY - 2 * MIN: (20.0, nan),
        T0 - 4 * DAY - 1 * MIN: (20.0, nan),
        T0 - 4 * DAY: (20.0, nan),
        T0 - 1 * DAY - 2 * MIN: (nan, 30.0),
        T0 - 1 * DAY - 1 * MIN: (nan, 30.0),
        T0 - 1 * DAY: (nan, 30.0),
    }
    assert set(rows) == set(expected)
    for t, (c1, c2) in expected.items():
        for got, want in zip(rows[t], (c1, c2)):
            assert (math.isnan(got) and math.isnan(want)) or got == want, (t, rows[t])


def test_only_virtual_cross_series_with_interpolation_golden(spark, make_samples):
    """Mirror of TestOnlyVirtualCrossSeriesAggregateWithInterpolation
    (ref: pqueriertest/cross_series_aggregation_integration_test.go:
    595-653): `select avg_all(prev_val(cpu))` step 2m over two series —
    the virtual avg is computed from the hidden sum/count of the
    prev_val-interpolated grid: 15, 1, 10.5."""
    from v3io_tsdb_spark.sql.parser import run_sql

    df = make_samples(
        [("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 1), (3 * MIN, 20), (5 * MIN, 20)]),
         ("cpu", {"os": "mac"}, [(0, 20), (2 * MIN, 1), (5 * MIN, 20)])]
    )
    q = Querier(spark, df)
    res = run_sql(q, "select avg_all(prev_val(cpu)) from tsdb",
                  step="2m", from_time=T0, to_time=T0 + 5 * MIN)
    got = {r["time"]: r["avg(cpu)"] for r in res.collect()}
    assert got == {T0: 15.0, T0 + 2 * MIN: 1.0, T0 + 4 * MIN: 10.5}


def test_cross_series_off_step_samples_golden(spark, make_samples):
    """Mirror of TestCrossSeriesAggregates (ref: cross_series_
    aggregation_integration_test.go:111-180): two series of one metric,
    samples at every minute but step 2m — grid points take the exact-
    time sample of each series (off-step samples don't leak in), then
    sum/min/avg across series."""
    d1 = [(0, 10.0), (MIN, 1.0), (2 * MIN, 20.0), (3 * MIN, 1.0), (4 * MIN, 30.0)]
    d2 = [(0, 20.0), (MIN, 1.0), (2 * MIN, 30.0), (3 * MIN, 1.0), (4 * MIN, 40.0)]
    df = make_samples([("cpu", {"os": "linux"}, d1), ("cpu", {"os": "mac"}, d2)])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", functions="sum_all,min_all,avg_all",
                                step="2m", from_time=T0, to_time=T0 + 5 * MIN))
    got = rows_to_dict(res, ["t"], ["sum", "min", "avg"])
    assert got == {
        T0: (30.0, 10.0, 15.0),
        T0 + 2 * MIN: (50.0, 20.0, 25.0),
        T0 + 4 * MIN: (70.0, 30.0, 35.0),
    }


def test_cross_series_different_labels_multiple_metrics_golden(spark, make_samples):
    """Mirror of TestCrossSeriesAggregatesDifferentLabelMultipleMetrics
    (ref: cross_series_aggregation_integration_test.go:723-800): two
    metrics each spanning two label sets — each metric sums across ITS
    OWN series only, one result series per metric."""
    d1 = [(0, 10.0), (MIN, 1.0), (2 * MIN, 20.0), (3 * MIN, 1.0), (4 * MIN, 30.0)]
    d2 = [(0, 20.0), (MIN, 1.0), (2 * MIN, 30.0), (3 * MIN, 1.0), (4 * MIN, 40.0)]
    df = make_samples([
        ("cpu", {"os": "linux"}, d1), ("cpu", {"os": "mac"}, d2),
        ("disk", {"os": "linux"}, d1), ("disk", {"os": "mac"}, d2),
    ])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu, disk", functions="sum_all",
                                step="2m", from_time=T0, to_time=T0 + 5 * MIN))
    got = {(r["name"], r["t"]): r["sum"] for r in res.collect()}
    exp = {T0: 30.0, T0 + 2 * MIN: 50.0, T0 + 4 * MIN: 70.0}
    assert got == {(m, t): v for m in ("cpu", "disk") for t, v in exp.items()}


def test_cross_series_interpolation_sql_golden(spark, make_samples):
    """Mirror of TestCrossSeriesAggregatesWithInterpolation (ref:
    cross_series_aggregation_integration_test.go:247-312): the SQL form
    ``select sum_all(prev_val(cpu)), min_all(prev_val(cpu)),
    max_all(prev_val(cpu))`` — per-series prev_val staircase at each
    grid point, then cross-series sum/min/max."""
    from v3io_tsdb_spark.sql.parser import run_sql

    d1 = [(0, 10.0), (MIN, 20.0), (3 * MIN, 30.0), (5 * MIN, 40.0)]
    d2 = [(0, 20.0), (2 * MIN, 30.0), (4 * MIN, 40.0)]
    df = make_samples([("cpu", {"os": "linux"}, d1), ("cpu", {"os": "mac"}, d2)])
    q = Querier(spark, df)
    wide = run_sql(
        q,
        "select sum_all(prev_val(cpu)), min_all(prev_val(cpu)), max_all(prev_val(cpu))",
        from_time=T0, to_time=T0 + 5 * MIN, step=2 * MIN,
    )
    rows = {r[wide.columns[0]]: r for r in wide.collect()}
    scol = next(c for c in wide.columns if c.startswith("sum"))
    mincol = next(c for c in wide.columns if c.startswith("min"))
    maxcol = next(c for c in wide.columns if c.startswith("max"))
    exp = {T0: (30.0, 10.0, 20.0),
           T0 + 2 * MIN: (50.0, 20.0, 30.0),
           T0 + 4 * MIN: (70.0, 30.0, 40.0)}
    assert set(rows) == set(exp)
    for t, (s, lo, hi) in exp.items():
        r = rows[t]
        assert (r[scol], r[mincol], r[maxcol]) == (s, lo, hi), (t, r)


def test_cross_series_multi_partition_golden(tmp_path, spark):
    """Mirror of TestCrossSeriesAggregatesMultiPartition (ref:
    cross_series_aggregation_integration_test.go:181-246), run through
    the ADAPTER so the series genuinely spans two dt partitions: cells
    near the later cluster fill from next samples within the default
    2-step tolerance (bqt-4m/bqt-2m -> 30), the 7-day hole stays
    empty, and the partition boundary leaks nothing."""
    from v3io_tsdb_spark.adapter import TSDBAdapter
    from v3io_tsdb_spark.config import TSDBConfig

    DAY = 86_400_000
    a = TSDBAdapter(spark, str(tmp_path / "xs_mp"), TSDBConfig())
    a.create()
    rows = []
    for os_, (v0, vb, vlast) in (("linux", (10.0, 20.0, 60.0)),
                                 ("mac", (20.0, 30.0, 40.0))):
        rows += [
            {"ts": T0 - 7 * DAY, "name": "cpu", "labels": {"os": os_}, "value": v0},
            {"ts": T0 - 7 * DAY + MIN, "name": "cpu", "labels": {"os": os_}, "value": 1.0},
            {"ts": T0, "name": "cpu", "labels": {"os": os_}, "value": vb},
            {"ts": T0 + MIN, "name": "cpu", "labels": {"os": os_}, "value": 1.0},
            {"ts": T0 + 2 * MIN, "name": "cpu", "labels": {"os": os_}, "value": vlast},
        ]
    a.append(rows)
    res = a.select(name="cpu", functions="max_all", step="2m",
                   from_time=T0 - 7 * DAY, to_time=T0 + 3 * MIN)
    got = {r["t"]: r["max"] for r in res.collect()}
    assert got == {
        T0 - 7 * DAY: 20.0,
        T0 - 4 * MIN: 30.0,
        T0 - 2 * MIN: 30.0,
        T0: 30.0,
        T0 + 2 * MIN: 60.0,
    }
