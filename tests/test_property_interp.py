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
