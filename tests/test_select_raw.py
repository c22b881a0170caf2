"""M1: raw select + wide frames (FIXTURES.md §1, §5)."""

import math

from conftest import MIN, T0
from pyspark.sql import functions as F

from v3io_tsdb_spark.operators.frames import to_wide_frame
from v3io_tsdb_spark.querier import Querier, SelectParams


def test_raw_select(spark, make_samples):
    df = make_samples([("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20), (2 * MIN, 30), (3 * MIN, 40)])])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", from_time=T0, to_time=T0 + 10 * MIN))
    rows = sorted(res.collect(), key=lambda r: r["t"])
    assert [(r["t"] - T0, r["value"]) for r in rows] == [
        (0, 10.0), (MIN, 20.0), (2 * MIN, 30.0), (3 * MIN, 40.0)
    ]
    assert rows[0]["labels"] == {"os": "linux"}


def test_raw_select_time_clip_and_filter(spark, make_samples):
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20), (9 * MIN, 90)]),
            ("cpu", {"os": "mac"}, [(0, 11)]),
            ("mem", {"os": "linux"}, [(0, 5)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", filter="os=='linux'", from_time=T0, to_time=T0 + 5 * MIN)
    )
    assert sorted(r["value"] for r in res.collect()) == [10.0, 20.0]


def test_wide_frame(spark, make_samples):
    # FIXTURES.md §5 golden wide frame
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (2 * MIN, 30)]),
            ("diskio", {"os": "linux"}, [(1 * MIN, 0.5), (2 * MIN, 0.7)]),
        ]
    )
    q = Querier(spark, df)
    raw = q.select(SelectParams(from_time=T0, to_time=T0 + 10 * MIN))
    wide = to_wide_frame(raw).collect()
    assert [r["t"] - T0 for r in wide] == [0, MIN, 2 * MIN]
    assert wide[0]["cpu"] == 10.0 and math.isnan(wide[0]["diskio"])
    assert math.isnan(wide[1]["cpu"]) and wide[1]["diskio"] == 0.5
    assert wide[2]["cpu"] == 30.0 and wide[2]["diskio"] == 0.7


def test_wide_frame_mixed_types(spark, make_samples):
    """Float and variant (string) metrics in one frame, per-column
    dtypes (ref: pkg/pquerier/frames.go:528-543)."""
    from v3io_tsdb_spark.operators.frames import to_wide_frame_mixed

    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (2 * MIN, 30)]),
            ("log", {"os": "linux"}, [(0, "boot"), (1 * MIN, "ready")]),
        ]
    )
    q = Querier(spark, df)
    raw = q.select(SelectParams(from_time=T0, to_time=T0 + 10 * MIN))
    wide = to_wide_frame_mixed(raw).collect()
    types = dict(to_wide_frame_mixed(q.select(SelectParams(from_time=T0, to_time=T0 + 10 * MIN))).dtypes)
    assert types["cpu"] == "double" and types["log"] == "string"
    assert [r["t"] - T0 for r in wide] == [0, MIN, 2 * MIN]
    assert wide[0]["cpu"] == 10.0 and wide[0]["log"] == "boot"
    assert math.isnan(wide[1]["cpu"]) and wide[1]["log"] == "ready"
    assert wide[2]["cpu"] == 30.0 and wide[2]["log"] is None


def test_mixed_frame_through_raw_ts_source(spark):
    """The r2 regression: a mixed float+variant query through sources
    that carry the native ``_ts_raw_ns`` scan-pushdown rider. Both
    branches must carry the rider (unionByName alignment), and the
    string rows must SURVIVE the raw-ts range predicate — a NULL rider
    (allowMissingColumns) would silently drop every variant row."""
    from v3io_tsdb_spark.datasets import events_as_samples, events_as_string_samples
    from v3io_tsdb_spark.operators.frames import to_wide_frame_mixed

    sf = "/root/testdata/sf0.001"
    floats = events_as_samples(spark, sf)
    strs = events_as_string_samples(spark, sf)
    assert set(floats.columns) == set(strs.columns)
    samples = floats.unionByName(strs)
    q = Querier(spark, samples)
    res = q.select(
        SelectParams(filter="uid=='3'", from_time=1704067200000, to_time=1706745600000)
    )
    n_str = res.where(res.value_str.isNotNull()).count()
    n_flt = res.where(res.value.isNotNull()).count()
    assert n_str > 0 and n_flt > 0  # both branches survive the ts clamp
    wide = to_wide_frame_mixed(res, nan_fill=False)
    types = dict(wide.dtypes)
    assert types.get("props_log") == "string"
    assert any(t == "double" for c, t in wide.dtypes if c not in ("t", "props_log"))


def test_multiple_metrics_with_multiple_label_sets(spark, make_samples):
    # ref: raw_query_integration_test.go:457-525 — a catch-all filter
    # over several metrics x label sets returns every series intact
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10)]),
            ("diskio", {"os": "linux"}, [(0, 20)]),
            ("diskio", {"os": "mac"}, [(0, 30), (MIN, 40)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(SelectParams(filter="1==1", from_time=T0, to_time=T0 + 5 * MIN))
    rows = res.select("name", "labels", "t", "value").collect()
    got = sorted((r["name"], r["labels"]["os"], r["t"] - T0, r["value"]) for r in rows)
    assert got == [
        ("cpu", "linux", 0, 10.0),
        ("diskio", "linux", 0, 20.0),
        ("diskio", "mac", 0, 30.0),
        ("diskio", "mac", MIN, 40.0),
    ]
    series = res.select("name", F.col("labels")["os"].alias("os")).distinct()
    assert series.count() == 3  # series count


def test_query_metric_without_data_in_range(spark, make_samples):
    # ref: raw_query_integration_test.go:628-700 — a requested metric
    # whose only data falls outside the range contributes nothing (and
    # the wide frame keeps its all-null column shape for it)
    DAY = 86_400_000
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (MIN, 20), (2 * MIN, 30), (3 * MIN, 40)]),
            ("diskio", {"os": "linux"}, [(-7 * DAY, 10)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu,diskio", from_time=T0 + MIN, to_time=T0 + 4 * MIN)
    )
    assert sorted(r["value"] for r in res.collect()) == [20.0, 30.0, 40.0]
    assert res.where(F.col("name") == "diskio").count() == 0
    # wide frame: diskio column exists but is entirely null
    from v3io_tsdb_spark.operators.frames import to_wide_frame

    wide = to_wide_frame(res, nan_fill=False, values=["cpu", "diskio"])
    assert wide.columns == ["t", "cpu", "diskio"]
    assert wide.where(F.col("diskio").isNotNull()).count() == 0
    assert wide.count() == 3


def test_zero_step_aggregates_golden(spark, make_samples):
    """Mirror of TestAggregatesWithZeroStepSelectDataframe (ref:
    pqueriertest/dataframe_query_integration_test.go:50-126): step 0
    aggregates the whole range into ONE cell indexed at `from`."""
    df = make_samples(
        [("cpu", {"os": "linux"}, [(i * MIN, 10.0 * (i + 1)) for i in range(4)])]
    )
    q = Querier(spark, df)
    res = q.select(
        SelectParams(name="cpu", functions="max,sum,count,min", step=0,
                     from_time=T0, to_time=T0 + 10 * MIN)
    ).collect()
    assert len(res) == 1
    r = res[0]
    assert r["t"] == T0
    assert (r["max"], r["sum"], r["count"], r["min"]) == (40.0, 100.0, 4, 10.0)


def test_two_series_one_empty_in_range_golden(spark, make_samples):
    """Mirror of Test2Series1EmptySelectDataframe (ref:
    pqueriertest/dataframe_query_integration_test.go:176-266): a metric
    whose only sample falls outside [from, to) contributes an all-NaN
    column at the other metric's index points — the frame keeps the
    column, the cells are missing."""
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(i * MIN, 10.0 * (i + 1)) for i in range(4)]),
            ("diskio", {"os": "linux"}, [(10 * MIN, 10.0)]),
        ]
    )
    from v3io_tsdb_spark.sql.parser import run_sql

    q = Querier(spark, df)
    wide = run_sql(
        q, "select cpu,diskio", from_time=T0, to_time=T0 + 4 * MIN
    ).collect()
    assert [r["t"] - T0 for r in wide] == [0, MIN, 2 * MIN, 3 * MIN]
    assert [r["cpu"] for r in wide] == [10.0, 20.0, 30.0, 40.0]
    assert all(math.isnan(r["diskio"]) for r in wide)


def test_column_order_follows_request_golden(spark, make_samples):
    """Mirror of TestColumnOrder (ref: pqueriertest/dataframe_query_
    integration_test.go:697-795): wide-frame columns come back in
    REQUEST order ('diskio,cpu'), with NaN cells where a metric has no
    sample at an index point."""
    from v3io_tsdb_spark.sql.parser import run_sql

    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10.0), (2 * MIN, 15.0), (3 * MIN, 18.0)]),
            ("diskio", {"os": "linux"},
             [(MIN, 20.0), (4 * MIN, 22.0), (5 * MIN, 26.0)]),
        ]
    )
    q = Querier(spark, df)
    wide = run_sql(q, "select diskio,cpu", from_time=T0, to_time=T0 + 5 * MIN)
    assert wide.columns == ["t", "diskio", "cpu"]
    rows = wide.collect()
    assert [r["t"] - T0 for r in rows] == [i * MIN for i in range(6)]
    exp_cpu = [10.0, None, 15.0, 18.0, None, None]
    exp_dio = [None, 20.0, None, None, 22.0, 26.0]
    for r, ec, ed in zip(rows, exp_cpu, exp_dio):
        assert (math.isnan(r["cpu"]) if ec is None else r["cpu"] == ec)
        assert (math.isnan(r["diskio"]) if ed is None else r["diskio"] == ed)


def test_sparse_string_and_numeric_columns_golden(spark, make_samples):
    """Mirror of TestSparseStringAndNumericColumnsDataframe (ref:
    pqueriertest/dataframe_query_integration_test.go:880-982): a float
    metric and a variant (string) metric with interleaved gaps share
    one time index; expected cpu = [10,20,30,NaN,50], log =
    [a,<missing>,c,d,e]. The reference represents a missing string cell
    as "" plus a null-values-map entry — the DataFrame NULL here IS
    that null-map entry (a real "" value would be indistinguishable
    otherwise)."""
    from v3io_tsdb_spark.operators.frames import to_wide_frame_mixed

    df = make_samples(
        [
            ("cpu", {"os": "linux"},
             [(0, 10.0), (MIN, 20.0), (2 * MIN, 30.0), (4 * MIN, 50.0)]),
            ("log", {"os": "linux"},
             [(0, "a"), (2 * MIN, "c"), (3 * MIN, "d"), (4 * MIN, "e")]),
        ]
    )
    q = Querier(spark, df)
    raw = q.select(SelectParams(name="cpu,log", from_time=T0, to_time=T0 + 5 * MIN))
    wide = to_wide_frame_mixed(raw).collect()
    assert [r["t"] - T0 for r in wide] == [i * MIN for i in range(5)]
    cpu = [r["cpu"] for r in wide]
    assert cpu[:3] == [10.0, 20.0, 30.0] and math.isnan(cpu[3]) and cpu[4] == 50.0
    assert [r["log"] for r in wide] == ["a", None, "c", "d", "e"]
