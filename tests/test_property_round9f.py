"""Hypothesis cross-checks for the round-9 ninth wave: pure-python
references for the Kaplan-Meier curve and the offset comparison."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY = 86_400_000

_SET = dict(max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck))


def _km_python(subjects):
    """Literal Kaplan-Meier: subjects = [(duration, event)] → rows
    {dur: (n_risk, n_events, n_censored, survival)} at event durations."""
    from collections import Counter

    ev = Counter(d for d, e in subjects if e)
    cen = Counter(d for d, e in subjects if not e)
    surv, out = 1.0, {}
    for d in sorted(set(d for d, _ in subjects)):
        n_risk = sum(1 for dd, _ in subjects if dd >= d)
        if ev[d]:
            surv *= 1.0 - ev[d] / n_risk
            out[d] = (n_risk, ev[d], cen[d], surv)
    return out


@settings(**_SET)
@given(
    subjects=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_km_curve_matches_python(spark, subjects):
    """The Spark curve (suffix-sum risk set + exp(Σ ln f) product with
    the absorbing-zero flag) must equal the literal sequential product
    walk, including exhausted-risk-set zeros and rows censored at
    event durations."""
    from v3io_tsdb_spark.operators.cohorts import _km_curve

    df = spark.createDataFrame(
        [(d, int(e)) for d, e in subjects], "duration long, _ev long"
    )
    got = {r["duration"]: r for r in _km_curve(df).collect()}
    want = _km_python(subjects)
    assert set(got) == set(want)
    for d, (n_risk, n_ev, n_cen, surv) in want.items():
        r = got[d]
        assert r["n_risk"] == n_risk and r["n_events"] == n_ev
        assert r["n_censored"] == n_cen
        assert math.isclose(r["survival"], surv, rel_tol=1e-9, abs_tol=1e-12)


@settings(**_SET)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda p: p[0],
    ),
    off=st.integers(min_value=1, max_value=9),
)
def test_offset_compare_matches_python(spark, days, off):
    """prev/delta/pct must equal a python dict lookup of the exact
    prior bucket — absent bucket → None, zero prev → pct None."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("m", "u", d * DAY, v) for d, v in days],
        "name string, uid string, t long, value double",
    )
    got = {r["t"] // DAY: r for r in offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=off,
    ).collect()}
    vals = dict(days)
    assert set(got) == set(vals)
    for d, v in days:
        r = got[d]
        assert math.isclose(r["value"], v)
        p = vals.get(d - off)
        if p is None:
            assert r["prev"] is None and r["delta"] is None and r["pct"] is None
        else:
            assert math.isclose(r["prev"], p)
            assert math.isclose(r["delta"], v - p)
            if p == 0:
                assert r["pct"] is None
            else:
                assert math.isclose(r["pct"], (v - p) / p)


@settings(**_SET)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=12,
    )
)
def test_mmr_lambda_one_matches_cosine_topk(spark, vecs):
    """With lam=1 the diversity term vanishes: MMR's greedy walk must
    reproduce cosine_topk's (rounded-cosine desc, id asc) order for
    any vector set, zero-norm vectors excluded by both paths."""
    from v3io_tsdb_spark.functions.similarity import cosine_topk, mmr_topk

    from pyspark.sql import functions as F

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.5, -0.25]
    nz = df.where(
        sum(F.col("embedding")[i] ** 2 for i in range(3)) > F.lit(0.0)
    )
    want = [r["vec_id"] for r in cosine_topk(nz, q, k=5).collect()]
    got = [r["vec_id"] for r in
           sorted(mmr_topk(df, q, k=5, lam=1.0, prefilter_m=12).collect(),
                  key=lambda r: r["rank"])]
    assert got == want


@settings(**_SET)
@given(
    xs=st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
                min_size=1, max_size=30),
    ys=st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
                min_size=1, max_size=30),
)
def test_ks_matches_python_ecdf_walk(spark, xs, ys):
    """D must equal a literal python ECDF comparison over the union
    of 6dp-rounded distinct values, including cross-side ties."""
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    def r6(v):
        import math as m
        y = v + 1e-9
        s = 1.0 if y >= 0 else -1.0
        return s * m.floor(abs(y) * 1e6 + 0.5) / 1e6

    ra, rb = [r6(v) for v in xs], [r6(v) for v in ys]
    want = max(
        abs(sum(1 for v in ra if v <= u) / len(ra)
            - sum(1 for v in rb if v <= u) / len(rb))
        for u in sorted(set(ra) | set(rb))
    )
    a = spark.createDataFrame([(v,) for v in xs], "value double")
    b = spark.createDataFrame([(v,) for v in ys], "value double")
    r = ks_2sample(a, b, "value").collect()[0]
    assert math.isclose(r["ks_d"], r6(want), abs_tol=2e-6), (r["ks_d"], want)


@settings(**_SET)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=1, max_value=15),
        ),
        min_size=1,
        max_size=20,
    ),
    gap=st.integers(min_value=0, max_value=3),
)
def test_merge_intervals_matches_python_sweep(spark, ivs, gap):
    """Merged blocks must equal a literal python sweep (sort by
    (start, end), extend while start <= running_end + gap), for any
    interval soup including nested and duplicate intervals."""
    from v3io_tsdb_spark.operators.intervals import merge_intervals

    intervals = sorted((s, s + l) for s, l in ivs)
    blocks, counts = [], []
    for s, e in intervals:
        if blocks and s <= blocks[-1][1] + gap:
            blocks[-1][1] = max(blocks[-1][1], e)
            counts[-1] += 1
        else:
            blocks.append([s, e])
            counts.append(1)
    want = [(b[0], b[1], c, b[1] - b[0]) for b, c in zip(blocks, counts)]
    df = spark.createDataFrame([(s, e) for s, e in intervals],
                               "start long, end long")
    got = sorted(
        ((r["start"], r["end"], r["n_merged"], r["covered"])
         for r in merge_intervals(df, merge_gap=gap).collect()),
    )
    assert got == sorted(want)


@settings(**_SET)
@given(
    xs=st.lists(
        st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 10.0),
        min_size=16, max_size=16,
    ),
    c=st.integers(min_value=-500, max_value=500).map(lambda v: v / 10.0),
)
def test_hw_level_shift_invariance(spark, xs, c):
    """Adding a constant c to every value must shift fitted and
    forecast by exactly c and leave residuals unchanged: the level
    absorbs constants (mean1+c, seasonals unchanged, every l update
    commutes with +c), and because c and the inputs are 6dp-exact the
    rounding boundaries cannot flip."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    def run(vals):
        df = spark.createDataFrame(
            [("m", i * DAY, float(v)) for i, v in enumerate(vals)],
            "name string, t long, value double",
        )
        return {r["t"]: r for r in holt_winters(
            df, series_cols=("name",), ts_col="t", value_col="value",
            step_ms=DAY, from_ms=0, n_buckets=16, period=7,
        ).collect()}

    base = run(xs)
    shifted = run([x + c for x in xs])
    assert set(base) == set(shifted) and len(base) == 9
    for t in base:
        b, s = base[t], shifted[t]
        assert math.isclose(s["fitted"] - b["fitted"], c, abs_tol=1e-6)
        assert math.isclose(s["residual"], b["residual"], abs_tol=1e-6)
        if b["forecast"] is not None:
            assert math.isclose(s["forecast"] - b["forecast"], c, abs_tol=1e-6)
