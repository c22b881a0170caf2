"""as-of join and bucketized range join vs brute-force references."""

import random

import pytest
from pyspark.sql import functions as F

from v3io_tsdb_spark.operators.asof import asof_join


def _brute_asof(lrows, rrows, direction="backward", tol=None):
    """dict (key, lts) -> (rts, rv) or None, by linear scan."""
    out = {}
    for key, lts in lrows:
        best = None
        for k2, rts, rv in rrows:
            if k2 != key:
                continue
            if direction == "backward":
                if rts <= lts and (tol is None or lts - rts <= tol):
                    if best is None or rts > best[0]:
                        best = (rts, rv)
            else:
                if rts >= lts and (tol is None or rts - lts <= tol):
                    if best is None or rts < best[0]:
                        best = (rts, rv)
        out[(key, lts)] = best
    return out


@pytest.fixture(scope="module")
def asof_data(spark):
    rng = random.Random(42)
    # unique (key, ts) on the right: ties make the match ambiguous
    lrows = [(f"k{rng.randrange(4)}", rng.randrange(0, 100_000)) for _ in range(300)]
    rts = rng.sample(range(0, 100_000), 200)
    rrows = [(f"k{i % 4}", t, float(i)) for i, t in enumerate(rts)]
    left = spark.createDataFrame(lrows, "uid string, ts long")
    right = spark.createDataFrame(rrows, "uid string, ts long, value double")
    return lrows, rrows, left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket_ms", [None, 7_000])
def test_asof_matches_brute_force(spark, asof_data, direction, bucket_ms):
    lrows, rrows, left, right = asof_data
    got = asof_join(
        left, right, on="ts", by=["uid"], direction=direction, bucket_ms=bucket_ms
    )
    assert set(got.columns) == {"uid", "ts", "ts_r", "value_r"}
    exp = _brute_asof(lrows, rrows, direction)
    res = {(r["uid"], r["ts"]): (r["ts_r"], r["value_r"]) for r in got.collect()}
    assert len(res) == len(set(lrows))
    for k, want in exp.items():
        have = res[k]
        if want is None:
            assert have == (None, None), k
        else:
            assert have == want, k


def test_asof_tolerance(spark, asof_data):
    lrows, rrows, left, right = asof_data
    got = asof_join(left, right, on="ts", by=["uid"], tolerance_ms=2_000)
    exp = _brute_asof(lrows, rrows, "backward", tol=2_000)
    res = {(r["uid"], r["ts"]): (r["ts_r"], r["value_r"]) for r in got.collect()}
    n_matched = sum(1 for v in exp.values() if v is not None)
    assert 0 < n_matched < len(exp)  # tolerance actually bites
    for k, want in exp.items():
        assert res[k] == (want if want else (None, None)), k


def test_asof_inclusive_and_left_rows_kept(spark):
    left = spark.createDataFrame([("a", 10), ("a", 5), ("b", 10)], "uid string, ts long")
    right = spark.createDataFrame([("a", 10, 1.0), ("a", 7, 2.0)], "uid string, ts long, value double")
    res = {
        (r["uid"], r["ts"]): (r["ts_r"], r["value_r"])
        for r in asof_join(left, right, on="ts", by=["uid"]).collect()
    }
    assert res[("a", 10)] == (10, 1.0)  # inclusive: equal ts matches
    assert res[("a", 5)] == (None, None)  # nothing at-or-before
    assert res[("b", 10)] == (None, None)  # key never on the right


def test_asof_bucketed_carry_across_empty_buckets(spark):
    # right row only in bucket 0; left rows many empty buckets later
    left = spark.createDataFrame([("a", 95_000), ("a", 50_000)], "uid string, ts long")
    right = spark.createDataFrame([("a", 1_000, 7.0)], "uid string, ts long, value double")
    res = {
        r["ts"]: r["value_r"]
        for r in asof_join(left, right, by=["uid"], bucket_ms=1_000).collect()
    }
    assert res == {95_000: 7.0, 50_000: 7.0}


def test_asof_single_shuffle_plan(spark, asof_data):
    """Unbucketed path: one Exchange on the by-keys, no joins at all."""
    _, _, left, right = asof_data
    plan = asof_join(left, right, by=["uid"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


from v3io_tsdb_spark.operators.intervals import range_join  # noqa: E402


def _brute_range(irows, prows):
    out = []
    for key, s, e, sid in irows:
        for k2, t, v in prows:
            if k2 == key and s <= t < e:
                out.append((sid, t, v))
    return sorted(out)


@pytest.fixture(scope="module")
def range_data(spark):
    rng = random.Random(7)
    irows = []
    for i in range(60):
        s = rng.randrange(0, 90_000)
        irows.append((f"k{rng.randrange(3)}", s, s + rng.randrange(1, 20_000), i))
    prows = [(f"k{rng.randrange(3)}", rng.randrange(0, 110_000), float(i)) for i in range(400)]
    intervals = spark.createDataFrame(irows, "uid string, start long, end long, sess_id long")
    points = spark.createDataFrame(prows, "uid string, ts long, value double")
    return irows, prows, intervals, points


@pytest.mark.parametrize("bucket_ms", [1_000, 8_192, 64_000])
def test_range_join_matches_brute_force(spark, range_data, bucket_ms):
    irows, prows, intervals, points = range_data
    got = range_join(intervals, points, by=["uid"], bucket_ms=bucket_ms)
    res = sorted((r["sess_id"], r["ts"], r["value"]) for r in got.collect())
    assert res == _brute_range(irows, prows)


def test_range_join_is_equi_join(spark, range_data):
    """The physical plan must be a hash equi-join on (keys, bucket) —
    not BroadcastNestedLoopJoin, which is what a naive inequality
    join degenerates to."""
    _, _, intervals, points = range_data
    plan = (
        range_join(intervals, points, by=["uid"], bucket_ms=8_192)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "SortMergeJoin" in plan or "HashJoin" in plan


def test_funnel_ordered_greedy_semantics(spark):
    """Funnel: steps must occur in order; greedy earliest-first; chain
    break leaves later steps null; users without step 1 are excluded."""
    from v3io_tsdb_spark.operators.funnel import funnel_steps

    rows = [
        # u1: clean v(10) -> c(20) -> p(30)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: purchase BEFORE click -> chain stops at click
        (2, "view", 10), (2, "purchase", 15), (2, "click", 20),
        # u3: click before view -> that click cannot count; later click does
        (3, "click", 5), (3, "view", 10), (3, "click", 12),
        # u4: no view at all -> excluded
        (4, "click", 10), (4, "purchase", 20),
        # u5: greedy: earliest view 10 (not 40); click must follow 10
        (5, "view", 40), (5, "view", 10), (5, "click", 25), (5, "purchase", 26),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r["user_id"]: r for r in
           funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out[1]["t_purchase"] == 30 and out[1]["steps_completed"] == 3
    assert out[2]["t_click"] == 20 and out[2]["t_purchase"] is None
    assert out[2]["steps_completed"] == 2
    assert out[3]["t_click"] == 12
    assert 4 not in out
    assert out[5]["t_view"] == 10 and out[5]["t_click"] == 25
    assert out[5]["steps_completed"] == 3
