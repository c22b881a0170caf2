"""Property tests (hypothesis): the exploded and windowed physical
strategies for grid interpolation are semantically identical, and
client aggregation matches a pandas reference computation.

The reference has no property tests (SURVEY §5); these guard the
engine's own strategy-equivalence claims.
"""

import math

import pandas as pd
import pytest
from conftest import T0
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from v3io_tsdb_spark.operators import interpolate as I

STEP = 10_000


def _mk_samples(spark, series_points):
    from v3io_tsdb_spark.appender import normalize_samples

    rows = []
    for sid, points in enumerate(series_points):
        for off, v in points:
            rows.append(
                {"ts": T0 + off, "name": f"m{sid}", "labels": {"s": str(sid)}, "value": float(v)}
            )
    return normalize_samples(spark, rows)


series_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40 * STEP),  # ts offset
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=3,
)


@pytest.mark.parametrize("interp", ["next_val", "linear"])
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=series_strategy, tol_steps=st.integers(min_value=1, max_value=4))
def test_exploded_equals_windowed(spark, interp, series, tol_steps):
    df = _mk_samples(spark, series)
    lo, hi = T0 + 5 * STEP, T0 + 35 * STEP
    kwargs = dict(
        from_ms=lo, to_ms=hi, step_ms=STEP, interp=interp,
        tolerance_ms=tol_steps * STEP,
    )
    fast = I._align_exploded(df, key_cols=("name", "labels", "series_id"),
                             ts_col="ts", value_col="value", **kwargs)
    slow = I._align_windowed(df, key_cols=("name", "labels", "series_id"),
                             ts_col="ts", value_col="value", **kwargs)
    f = {(r["name"], r["t"]): r["value"] for r in fast.collect()}
    s = {(r["name"], r["t"]): r["value"] for r in slow.collect()}
    assert set(f) == set(s)
    for k in f:
        assert f[k] == pytest.approx(s[k]), (k, f[k], s[k])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=series_strategy)
def test_client_agg_matches_pandas(spark, series):
    from v3io_tsdb_spark.querier import Querier, SelectParams

    df = _mk_samples(spark, series)
    lo, hi = T0, T0 + 40 * STEP
    q = Querier(spark, df)
    res = q.select(
        SelectParams(functions="sum,count,min,max,avg", step=4 * STEP,
                     from_time=lo, to_time=hi)
    )
    got = {
        (r["name"], r["t"]): (r["sum"], r["count"], r["min"], r["max"], r["avg"])
        for r in res.collect()
    }

    rows = [
        (f"m{sid}", T0 + off, float(v))
        for sid, pts in enumerate(series)
        for off, v in pts
        if lo <= T0 + off <= hi
    ]
    exp = {}
    if rows:
        pdf = pd.DataFrame(rows, columns=["name", "ts", "v"])
        pdf["t"] = lo + ((pdf["ts"] - lo) // (4 * STEP)) * (4 * STEP)
        for (name, t), g in pdf.groupby(["name", "t"]):
            exp[(name, int(t))] = (
                g["v"].sum(), len(g), g["v"].min(), g["v"].max(), g["v"].mean()
            )
    assert set(got) == set(exp)
    for k, (s_, c, mn, mx, av) in exp.items():
        gs, gc, gmn, gmx, gav = got[k]
        assert (gs, gc, gmn, gmx) == (pytest.approx(s_), c, mn, mx)
        assert gav == pytest.approx(av) or (math.isnan(gav) and math.isnan(av))


# -- round-3 operators: sessionize and count-based jaccard ------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    offs=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                  max_size=12, unique=True),
    gap=st.integers(min_value=1, max_value=10),
)
def test_sessionize_matches_python_reference(spark, offs, gap):
    """session_window == the classic island scan (break strictly > gap,
    end = last + gap) for arbitrary event sets."""
    from v3io_tsdb_spark.operators.sessions import sessionize

    SEC = 1000
    ts = sorted(o * SEC for o in offs)
    df = spark.createDataFrame([("m", t, 1.0) for t in ts],
                               "name string, ts long, value double")
    got = {
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap * SEC, group_cols=("name",)).collect()
    }
    want = set()
    cur = [ts[0]]
    for t in ts[1:]:
        if t - cur[-1] > gap * SEC:
            want.add((cur[0], cur[-1] + gap * SEC, len(cur)))
            cur = [t]
        else:
            cur.append(t)
    want.add((cur[0], cur[-1] + gap * SEC, len(cur)))
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=10),
        min_size=2, max_size=8,
    ),
    max_df=st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
)
def test_ngram_jaccard_matches_python_reference(spark, docs, max_df):
    """Count-based intersection (with and without a firing cap) ==
    brute-force shingle-set jaccard on every pair the capped index can
    reach (pairs sharing >= 1 below-cap shingle)."""
    from collections import Counter

    from v3io_tsdb_spark.functions.dedup import ngram_jaccard_pairs

    texts = [" ".join(words) for words in docs]
    sdf = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(sdf, threshold=0.3, n=2, max_df=max_df).collect()}

    def sh(t):
        toks = t.lower().split()
        if len(toks) < 2:
            return {" ".join(toks)}
        return {f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)}

    sets = [sh(t) for t in texts]
    df_count = Counter(g for s in sets for g in s)
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = sets[i] & sets[j]
            reachable = max_df is None or any(df_count[g] <= max_df for g in inter)
            if not inter or not reachable:
                continue
            jac = len(inter) / len(sets[i] | sets[j])
            if jac >= 0.3:
                want[(i, j)] = round(jac + 1e-9, 6)
    assert got == want


def test_reference_interpolate_golden_table(spark):
    """Mirror of pkg/pquerier/interpolate_test.go:36-83 through the
    aligner + the collector's cell rule (collector.go:262-273): samples
    prev=(t0+10, 100) next=(t0+110, 200), one grid cell at t0+60,
    unlimited tolerance. Expected cell values per interpolator:
    none → 200 (the collector writes interpolatedV even though the fn
    reports the sample's own time), nan → NaN, prev_val → 100,
    next_val → 200, linear → 150 (and NaN next ⇒ NaN)."""
    df = _mk_samples(spark, [[(10, 100), (110, 200)]])
    golden = {
        "none": 200.0,
        "nan": float("nan"),
        "prev_val": 100.0,
        "next_val": 200.0,
        "linear": 150.0,
    }
    for interp, want in golden.items():
        out = I.align_to_grid(
            df, T0 + 60, T0 + 60, 60_000, interp=interp,
            tolerance_ms=10**15,
        ).collect()
        assert len(out) == 1, (interp, out)
        got = out[0]["value"]
        if math.isnan(want):
            assert math.isnan(got), interp
        else:
            assert got == want, (interp, got)
    # lin with NaN next value propagates NaN (interpolate_test.go:79-82)
    df2 = _mk_samples(spark, [[(10, 100), (110, float("nan"))]])
    out = I.align_to_grid(
        df2, T0 + 60, T0 + 60, 60_000, interp="linear", tolerance_ms=10**15
    ).collect()
    assert len(out) == 1 and math.isnan(out[0]["value"])
