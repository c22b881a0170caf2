"""Hypothesis cross-checks for the round-9 third wave: the Spark
operators against literal pure-python references on arbitrary input —
the same strategy-equivalence style as test_property_router."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY = 86_400_000


def _mid(sorted_vals):
    m = len(sorted_vals)
    return (sorted_vals[(m + 1) // 2 - 1] + sorted_vals[m // 2]) / 2.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=2,
        max_size=12,
    )
)
def test_theilsen_matches_python_reference(spark, xs):
    """Spark's array-algebra Theil-Sen == a literal python median of
    all pairwise slopes, on arbitrary daily grids (6 dp envelope, the
    operator's own rounding boundary)."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    rows = [("m", "u", i * DAY, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    got = theilsen_trend(df).collect()[0]

    xr = [round(x + 1e-9, 6) for x in xs]
    slopes = sorted(
        round((xr[j] - xr[i]) / float(j - i) + 1e-9, 6)
        for i in range(len(xr))
        for j in range(i + 1, len(xr))
    )
    want_slope = round(_mid(slopes) + 1e-9, 6)
    assert got["n_pairs"] == len(slopes)
    assert math.isclose(got["slope"], want_slope, abs_tol=1e-9)
    ics = sorted(
        round(xr[i] - want_slope * i + 1e-9, 6) for i in range(len(xr))
    )
    assert math.isclose(
        got["intercept"], round(_mid(ics) + 1e-9, 6), abs_tol=1e-9
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    baskets=st.lists(
        st.lists(st.sampled_from("ABCDE"), min_size=1, max_size=4),
        min_size=2,
        max_size=12,
    )
)
def test_assoc_rules_identities_hold(spark, baskets):
    """On arbitrary baskets the rule identities must hold exactly:
    support·n_baskets == c_pair, confidence·c_ante == c_pair, the
    pair count is symmetric, and c_pair <= min(c_ante, c_cons)."""
    from v3io_tsdb_spark.operators.assoc import basket_assoc_rules

    rows = [("b%d" % i, it) for i, items in enumerate(baskets) for it in items]
    df = spark.createDataFrame(rows, "bid string, item string")
    out = basket_assoc_rules(df, ("bid",), "item").collect()
    got = {(r["ante"], r["cons"]): r for r in out}
    for (a, c), r in got.items():
        assert math.isclose(r["support"] * r["n_baskets"], r["c_pair"])
        assert math.isclose(r["confidence"] * r["c_ante"], r["c_pair"])
        assert r["c_pair"] <= min(r["c_ante"], r["c_cons"])
        assert got[(c, a)]["c_pair"] == r["c_pair"]
    # ground truth pair counts from python sets
    sets = [set(items) for items in baskets]
    for (a, c), r in got.items():
        assert r["c_pair"] == sum(1 for s in sets if a in s and c in s)
