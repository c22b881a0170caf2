"""Hypothesis cross-checks for the round-9 fourth-sixth waves: each
Spark operator against a literal pure-python reference on arbitrary
input — the strategy-equivalence style of test_property_router."""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY = 86_400_000

_SET = dict(max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck))


# ------------------------------------------- extrapolated increase


def _py_increase(samples, start, end):
    """Literal Prometheus extrapolatedRate (increase flavor)."""
    samples = sorted(samples)
    if len(samples) < 2:
        return None
    (first_t, first_v), (last_t, last_v) = samples[0], samples[-1]
    if last_t == first_t:
        return None
    corr, prev = 0.0, None
    for _, v in samples:
        if prev is not None and v < prev:
            corr += prev
        prev = v
    delta = last_v - first_v + corr
    sampled = float(last_t - first_t)
    avg = sampled / (len(samples) - 1)
    ds, de = float(first_t - start), float(end - last_t)
    if delta > 0 and first_v >= 0:
        ds = min(ds, sampled * first_v / delta)
    th = avg * 1.1
    ext = sampled + (ds if ds < th else avg / 2) + (de if de < th else avg / 2)
    return delta * ext / sampled


@settings(**_SET)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=2,
        max_size=10,
        unique_by=lambda p: p[0],
    )
)
def test_increase_matches_python_prometheus(spark, pts):
    """Spark's aggregate-algebra increase == the literal sequential
    Prometheus algorithm, on arbitrary single-bucket sample sets."""
    from v3io_tsdb_spark.operators.counters import extrapolated_increase

    df = spark.createDataFrame(
        [("m", "u", t, v) for t, v in pts],
        "name string, uid string, t long, value double",
    )
    got = extrapolated_increase(df, ts_col="t", step_ms=100, from_ms=0).collect()
    want = _py_increase(pts, 0, 100)
    if want is None:
        assert got == []
    else:
        assert len(got) == 1
        assert math.isclose(got[0]["increase"], want, rel_tol=1e-9, abs_tol=1e-9)


# ------------------------------------------- seasonal decomposition


@settings(**_SET)
@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=14,
        max_size=21,
    )
)
def test_seasonal_decompose_identity_and_centering(spark, xs):
    """On any full daily grid: (a) value − trend − seasonal == residual
    row-by-row wherever trend exists (join alignment), and (b) the 7
    per-phase seasonal indexes sum to ~0 (the centering step)."""
    from v3io_tsdb_spark.operators.trend import seasonal_decompose

    rows = [("m", "u", i * DAY, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = seasonal_decompose(df, ts_col="t", step_ms=DAY, from_ms=0).collect()
    assert len(out) == len(xs)
    phases = {}
    for r in out:
        phases[r["phase"]] = r["seasonal"]
        if r["trend"] is not None:
            assert math.isclose(
                r["value"] - r["trend"] - r["seasonal"], r["residual"],
                rel_tol=1e-9, abs_tol=1e-9,
            )
    if len(phases) == 7 and all(v is not None for v in phases.values()):
        assert abs(sum(phases.values())) < 1e-6


# ------------------------------------------------- inter-arrival


@settings(**_SET)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=1000), min_size=2,
                  max_size=12),
    c=st.integers(min_value=2, max_value=50),
)
def test_interarrival_cv_is_scale_invariant(spark, gaps, c):
    """Scaling every gap by c multiplies the mean by c and leaves the
    coefficient of variation unchanged — cv is a SHAPE statistic, which
    is exactly why it screens bots across traffic volumes."""
    from v3io_tsdb_spark.operators.gaps import interarrival_stats

    def run(mult):
        ts, acc = [], 0
        for g in gaps:
            acc += g * mult
            ts.append(acc)
        rows = [(1, 0, 0)] + [(1, t, i + 1) for i, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_id long")
        return interarrival_stats(df, "user_id", "ts_ms", "event_id").collect()[0]

    r1, rc = run(1), run(c)
    assert math.isclose(rc["mean_gap_ms"], r1["mean_gap_ms"] * c, rel_tol=1e-9)
    if r1["cv_gap"] is not None:
        assert math.isclose(rc["cv_gap"], r1["cv_gap"], rel_tol=1e-9, abs_tol=1e-12)


# ------------------------------------------------- path mining


def _py_paths(rows, gap, n):
    by_user = defaultdict(list)
    for u, t, e, i in rows:
        by_user[u].append((t, e, i))
    counts = Counter()
    for evs in by_user.values():
        evs.sort()
        groups, prev_t = [], None
        for t, e, _ in evs:
            if prev_t is None or t - prev_t > gap:
                groups.append([])
            groups[-1].append(e)
            prev_t = t
        for g in groups:
            for j in range(len(g) - n + 1):
                counts[">".join(g[j:j + n])] += 1
    return counts


@settings(**_SET)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=5000),
            st.sampled_from(["A", "B", "C"]),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_path_trigrams_match_python_reference(spark, evs):
    """Full path-count multiset == the literal python sessionize+ngram
    on arbitrary event streams (unique ids appended so the total order
    is deterministic in both)."""
    from v3io_tsdb_spark.operators.paths import session_path_ngrams

    rows = [(u, t, e, i) for i, (u, t, e) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )
    got = Counter({
        r["path"]: r["occurrences"]
        for r in session_path_ngrams(df, gap_ms=500, n=3, k=10_000).collect()
    })
    assert got == _py_paths(rows, 500, 3)


# ------------------------------------------------------- Benford


@settings(**_SET)
@given(
    vals=st.lists(
        st.floats(min_value=0.1, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
def test_benford_matches_python_reference(spark, vals):
    """Digit counts and the all-9-digit χ² == a literal python count
    over int(floor(v)) first characters, v ≥ 1 only."""
    from v3io_tsdb_spark.functions.histogram import benford_profile

    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {r["digit"]: r for r in benford_profile(df).collect()}
    want = Counter(int(str(int(math.floor(v)))[0]) for v in vals if v >= 1)
    if not want:
        return  # no qualifying rows: profile is degenerate, skip
    for d in range(1, 10):
        assert out[d]["n"] == want.get(d, 0)
    n = sum(want.values())
    chi = sum(
        (want.get(d, 0) - math.log10(1 + 1 / d) * n) ** 2
        / (math.log10(1 + 1 / d) * n)
        for d in range(1, 10)
    )
    assert math.isclose(out[1]["chi2"], chi, rel_tol=1e-9)


# ------------------------------------------------------------ PSI


@settings(**_SET)
@given(
    a=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20),
    b=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20),
)
def test_psi_is_symmetric_and_zero_on_identical(spark, a, b):
    """psi(A,B) == psi(B,A) (each bin part is symmetric under the
    swap), and psi(A,A) == 0 exactly."""
    from v3io_tsdb_spark.functions.histogram import psi_drift

    da = spark.createDataFrame([(v,) for v in a], "v long")
    db = spark.createDataFrame([(v,) for v in b], "v long")
    p_ab = psi_drift(da, db, "v", width=100.0).collect()[0]["psi"]
    p_ba = psi_drift(db, da, "v", width=100.0).collect()[0]["psi"]
    assert math.isclose(p_ab, p_ba, rel_tol=1e-9, abs_tol=1e-12)
    p_aa = psi_drift(da, da, "v", width=100.0).collect()[0]["psi"]
    assert abs(p_aa) < 1e-12


# --------------------------------------------------- corr matrix


@settings(**_SET)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    )
)
def test_corr_matrix_matches_python_pearson(spark, pts):
    """The (m1, m2) cell == the textbook Pearson r over the aligned
    bucket means, null exactly when either side has zero variance."""
    from v3io_tsdb_spark.operators.trend import metric_corr_matrix

    rows = []
    for i, (x, y) in enumerate(pts):
        rows.append(("m1", "u", i * 100, float(x)))
        rows.append(("m2", "u", i * 100, float(y)))
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {(r["name_a"], r["name_b"]): r for r in
           metric_corr_matrix(df, ts_col="t", step_ms=100, from_ms=0).collect()}
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    got = out[("m1", "m2")]["corr"]
    if sxx == 0 or syy == 0:
        assert got is None or math.isnan(got)
    else:
        assert math.isclose(got, sxy / math.sqrt(sxx * syy),
                            rel_tol=1e-6, abs_tol=1e-9)
