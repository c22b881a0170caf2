"""M2: client aggregations (FIXTURES.md §1 goldens + derived funcs).

Golden source: reference client-aggregates suite
(ref: pqueriertest/client_aggregates_integration_test.go:168-222).
"""

import math

import pytest
from conftest import MIN, T0, rows_to_dict

from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.querier import Querier, SelectParams

BASIC = [("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20), (2 * MIN, 30), (3 * MIN, 40)])]


def test_sum_min_max_step(spark, make_samples):
    q = Querier(spark, make_samples(BASIC))
    res = q.select(
        SelectParams(name="cpu", functions="sum,min,max", step="2m", from_time=T0, to_time=T0 + 10 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["sum", "min", "max"])
    assert got == {T0: (30.0, 10.0, 20.0), T0 + 2 * MIN: (70.0, 30.0, 40.0)}


def test_avg_count_last(spark, make_samples):
    q = Querier(spark, make_samples(BASIC))
    res = q.select(
        SelectParams(name="cpu", functions="avg,count,last", step="2m", from_time=T0, to_time=T0 + 10 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["avg", "count", "last"])
    assert got == {T0: (15.0, 2, 20.0), T0 + 2 * MIN: (35.0, 2, 40.0)}


def test_stddev_stdvar_formula(spark, make_samples):
    # sample formula (n*sqr - sum^2)/(n*(n-1)), ref: aggregate.go:371-388
    q = Querier(spark, make_samples(BASIC))
    res = q.select(
        SelectParams(name="cpu", functions="stddev,stdvar", step="4m", from_time=T0, to_time=T0 + 4 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["stddev", "stdvar"])
    vals = [10.0, 20.0, 30.0, 40.0]
    n = 4
    s = sum(vals)
    sq = sum(v * v for v in vals)
    var = (n * sq - s * s) / (n * (n - 1))
    assert got[T0][1] == pytest.approx(var)
    assert got[T0][0] == pytest.approx(math.sqrt(var))


def test_rate(spark, make_samples):
    # rate = (last[i] - last[i-1]) / step_sec, ref: aggregate/iterator.go:327-334
    q = Querier(spark, make_samples(BASIC))
    res = q.select(
        SelectParams(name="cpu", functions="rate", step="2m", from_time=T0, to_time=T0 + 10 * MIN)
    )
    got = rows_to_dict(res, ["t"], ["rate"])
    assert got[T0] is None  # no previous bucket
    assert got[T0 + 2 * MIN] == pytest.approx((40.0 - 20.0) / 120.0)


def test_empty_bucket_suppression(spark, make_samples):
    # buckets without samples are absent, ref: aggregate/iterator.go:361-364
    df = make_samples([("cpu", {}, [(0, 1), (9 * MIN, 2)])])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", functions="sum", step="1m", from_time=T0, to_time=T0 + 10 * MIN))
    assert sorted(r["t"] - T0 for r in res.collect()) == [0, 9 * MIN]


def test_default_single_bucket(spark, make_samples):
    # no step → one bucket over the whole range
    q = Querier(spark, make_samples(BASIC))
    res = q.select(SelectParams(name="cpu", functions="sum", from_time=T0, to_time=T0 + 10 * MIN))
    got = rows_to_dict(res, ["t"], ["sum"])
    assert got == {T0: 100.0}


def test_mixed_cross_series_error(spark, make_samples):
    q = Querier(spark, make_samples(BASIC))
    with pytest.raises(BadRequest):
        q.select(SelectParams(name="cpu", functions="sum,avg_all", step="2m", from_time=T0, to_time=T0 + 4 * MIN))


def test_multi_series_aggregation(spark, make_samples):
    df = make_samples(
        [
            ("cpu", {"os": "linux"}, [(0, 10), (1 * MIN, 20)]),
            ("cpu", {"os": "mac"}, [(0, 30), (1 * MIN, 40)]),
        ]
    )
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", functions="sum", step="2m", from_time=T0, to_time=T0 + 2 * MIN))
    rows = res.collect()
    assert len(rows) == 2  # one bucket per series
    assert sorted(r["sum"] for r in rows) == [30.0, 70.0]
    by_labels = {r["labels"]["os"]: r["sum"] for r in rows}
    assert by_labels == {"linux": 30.0, "mac": 70.0}


def test_star_expands_to_all_aggregates(spark, make_samples):
    """functions='*' selects every aggregate (ref: aggregate.go:51,60
    aggrTypeAll)."""
    from v3io_tsdb_spark.operators.aggregates import ALL_AGGREGATES, parse_functions

    assert parse_functions("*") == (list(ALL_AGGREGATES), False)
    df = make_samples([("cpu", {}, [(0, 1.0), (60_000, 3.0)])])
    from v3io_tsdb_spark.querier import Querier, SelectParams
    from conftest import T0
    res = Querier(spark, df).select(
        SelectParams(name="cpu", functions="*", step="1h",
                     from_time=T0 - 1, to_time=T0 + 3_600_000)
    )
    assert set(ALL_AGGREGATES) <= set(res.columns)


def test_negative_values_golden(spark, make_samples):
    """Mirror of the reference's negative-values server-aggregates
    golden (ref: pqueriertest/server_aggregates_integration_test.go:
    104-163): four negative samples, sum/max/min with a 4h step →
    ONE bucket with sum=-100, min=-40, max=-10. (The reference anchors
    the bucket at its storage-partition start; this engine anchors at
    from_time — value facts are identical.)"""
    HOUR = 3_600_000
    data = [("cpu", {"os": "linux"},
             [(0, -10), (1 * MIN, -20), (2 * MIN, -30), (3 * MIN, -40)])]
    q = Querier(spark, make_samples(data))
    res = q.select(
        SelectParams(name="cpu", functions="sum,max,min", step="4h",
                     from_time=T0 - 4 * HOUR, to_time=T0 + 10 * MIN)
    )
    rows = res.collect()
    assert len(rows) == 1
    assert (rows[0]["sum"], rows[0]["min"], rows[0]["max"]) == (-100.0, -40.0, -10.0)


def test_mixed_aggregate_and_raw_columns_golden(spark, make_samples):
    """Mirror of TestSelectServerAggregatesAndRawByRequestedColumns
    (ref: pqueriertest/server_aggregates_integration_test.go:292-347):
    one select with a sum column AND a function-less raw column with
    next_val interpolation — the aggregate answers sum=100 in its
    bucket while the raw column yields the interpolated value 10 on
    the same step grid (the reference emits 2 series; the wide-frame
    analog is two value columns)."""
    from v3io_tsdb_spark.querier import RequestedColumn

    HOUR = 3_600_000
    data = [("cpu", {"os": "linux"},
             [(0, 10), (1 * MIN, 20), (2 * MIN, 30), (3 * MIN, 40)])]
    q = Querier(spark, make_samples(data))
    res = q.select(
        SelectParams(
            columns=[
                RequestedColumn(metric="cpu", function="sum"),
                RequestedColumn(metric="cpu", interpolator="next_val",
                                tolerance=5 * HOUR),
            ],
            step="4h", from_time=T0 - 4 * HOUR, to_time=T0 + 5 * MIN,
        )
    )
    got = {r["t"]: (r["sum"], r["value"]) for r in res.collect()}
    # grid cell T0-4h: no samples yet, next_val within 5h tolerance → 10
    assert got[T0 - 4 * HOUR] == (None, 10.0)
    # bucket/cell T0: sum of all four samples; raw value at T0 is 10
    assert got[T0] == (100.0, 10.0)
    assert len(got) == 2


def test_aggregation_big_gaps_golden(spark, make_samples):
    """Mirror of TestSelectDataframeAggregationsMetricsHaveBigGaps (ref:
    pqueriertest/dataframe_query_integration_test.go:440-516): sparse
    counts at 1m step — three union index rows, each metric counting
    only its own bucket, absent cells empty."""
    from v3io_tsdb_spark.sql.parser import run_sql

    DAY = 86_400_000
    df = make_samples(
        [("cpu1", {"os": "linux"}, [(-7 * DAY, 10), (-4 * DAY, 20)]),
         ("cpu2", {"os": "linux"}, [(-1 * DAY, 30)])]
    )
    q = Querier(spark, df)
    wide = run_sql(q, "select count(cpu1), count(cpu2) from tsdb",
                   step="1m", from_time=T0 - 7 * DAY, to_time=T0)
    rows = {r["time"]: (r["count(cpu1)"], r["count(cpu2)"]) for r in wide.collect()}
    assert rows == {
        T0 - 7 * DAY: (1.0, None),
        T0 - 4 * DAY: (1.0, None),
        T0 - 1 * DAY: (None, 1.0),
    }


DAY = 86_400_000
HOUR = 3_600_000


def test_aggregate_name_wildcard_golden(spark, make_samples):
    """Mirror of TestQueryAggregateWithNameWildcard (ref:
    pqueriertest/client_aggregates_integration_test.go:47-108): no Name
    param -> every metric aggregates, identical cells per metric."""
    pts = [(-7 * DAY, 10.0), (1 * MIN, 20.0), (2 * MIN, 30.0), (3 * MIN, 40.0)]
    df = make_samples([("cpu", {"os": "linux"}, pts),
                       ("diskio", {"os": "linux"}, pts)])
    q = Querier(spark, df)
    res = q.select(SelectParams(functions="max,min,sum", step="2m",
                                from_time=T0 - 7 * DAY, to_time=T0 + 10 * MIN))
    got = {(r["name"], r["t"]): (r["max"], r["min"], r["sum"])
           for r in res.collect()}
    exp_cells = {
        T0 - 7 * DAY: (10.0, 10.0, 10.0),
        T0: (20.0, 20.0, 20.0),
        T0 + 2 * MIN: (40.0, 30.0, 70.0),
    }
    assert got == {(m, t): v for m in ("cpu", "diskio")
                   for t, v in exp_cells.items()}


def test_server_aggregates_negative_values_golden(spark, make_samples):
    """Mirror of TestRawAggregatesSinglePartitionNegativeValues (ref:
    pqueriertest/server_aggregates_integration_test.go:104-163):
    all-negative samples through the ROLLUP-routed path — min/max/sum
    must come from real data, not zero-initialized accumulators."""
    from v3io_tsdb_spark.config import TSDBConfig
    from v3io_tsdb_spark.rollup import build_rollup

    df = make_samples(
        [("cpu", {"os": "linux"},
          [(i * MIN, -10.0 * (i + 1)) for i in range(4)])]
    )
    cfg = TSDBConfig(aggregation_granularity="1h")
    q = Querier(spark, df, rollup=build_rollup(df, cfg.granularity_ms), config=cfg)
    # step/granularity = 4 > coefficient(3) -> routed to the rollup with
    # the step INTACT (the DisableClientAggr step clamp does not apply)
    p = SelectParams(functions="sum,min,max", step="4h",
                     from_time=T0 - 4 * HOUR, to_time=T0 + 10 * MIN)
    assert q._can_use_rollup(["sum", "min", "max"], 4 * HOUR, 0, p)
    rows = q.select(p).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["t"] == T0 - 4 * HOUR
    assert (r["sum"], r["min"], r["max"]) == (-100.0, -40.0, -10.0)


def test_get_empty_response_golden(spark, make_samples):
    """Mirror of TestGetEmptyResponse (ref: client_aggregates_
    integration_test.go:400-443): a range with no data returns an
    empty result, not an error."""
    df = make_samples([("cpu", {"os": "linux"}, [(-7 * DAY, 10.0)])])
    q = Querier(spark, df)
    res = q.select(SelectParams(name="cpu", functions="sum,max,min,sqr",
                                step="3h",
                                from_time=T0 - 10 * DAY, to_time=T0 - 8 * DAY))
    assert res.count() == 0


def test_column_spec_negative_duplicates(spark, make_samples):
    """Mirror of selectQueryContext_test.go TestNegativeCreateColumnSpecs:
    duplicate functions / duplicate (metric, function) column specs are
    errors, including whitespace variants."""
    from v3io_tsdb_spark.errors import BadRequest
    from v3io_tsdb_spark.querier import RequestedColumn

    df = make_samples([("cpu", {"os": "linux"}, [(0, 10), (MIN, 20)])])
    q = Querier(spark, df)
    with pytest.raises(BadRequest):
        q.select(SelectParams(name="cpu", functions="count, count",
                              from_time=T0, to_time=T0 + 2 * MIN, step="1m"))
    with pytest.raises(BadRequest):
        q.select(SelectParams(name="cpu", functions="count, max,count",
                              from_time=T0, to_time=T0 + 2 * MIN, step="1m"))
    for dup_fn in ("count", "  count "):
        with pytest.raises(BadRequest):
            q.select(SelectParams(
                columns=[
                    RequestedColumn(metric="cpu", function="count"),
                    RequestedColumn(metric="diskio", function="count"),
                    RequestedColumn(metric="cpu", function=dup_fn),
                ],
                from_time=T0, to_time=T0 + 2 * MIN, step="1m",
            ))
    # but the SAME function on DIFFERENT metrics stays legal
    q.select(SelectParams(
        columns=[RequestedColumn(metric="cpu", function="count"),
                 RequestedColumn(metric="diskio", function="count")],
        from_time=T0, to_time=T0 + 2 * MIN, step="1m",
    )).collect()


def test_column_spec_interpolator_inheritance(spark, make_samples):
    """Mirror of TestCreateColumnSpecs sibling-inheritance: a
    function-less column of a metric whose sibling declared an
    interpolator inherits it (prev_val here — observable because
    prev_val fills from BEFORE the cell, next_val from after)."""
    from v3io_tsdb_spark.querier import RequestedColumn

    # a sample before the grid cells and one far after: Seek succeeds
    # (reference rule — no fill without a next sample), and within the
    # tolerance prev_val fills 42 from behind while next_val would fill
    # 99 from ahead — a clean discriminator for which interp ran
    df = make_samples([("cpu", {"os": "linux"}, [(0, 42.0), (10 * MIN, 99.0)])])
    q = Querier(spark, df)

    def run(cols):
        out = q.select(SelectParams(
            columns=cols, from_time=T0, to_time=T0 + 10 * MIN, step="1m",
            tolerance="10m",
        )).collect()
        return {r["t"]: r["value"] for r in out}

    # explicit prev_val: the T0+1m cell fills 42 from behind (next_val
    # would fill 99 from the sample at T0+10m, inside the tolerance)
    explicit = run([RequestedColumn(metric="cpu", interpolator="prev_val")])
    assert explicit[T0 + MIN] == 42.0
    nexts = run([RequestedColumn(metric="cpu", interpolator="next_val")])
    assert nexts[T0 + MIN] == 99.0  # discriminator sanity
    # two function-less columns... not allowed (duplicate); instead pair
    # a declared-interp sibling WITH a function and a bare raw column:
    inherited = run([
        RequestedColumn(metric="cpu", function="count", interpolator="prev_val"),
        RequestedColumn(metric="cpu"),
    ])
    # the raw column inherited prev_val: T0+1m fills 42 from behind,
    # not 99 from ahead
    assert inherited[T0 + MIN] == 42.0
