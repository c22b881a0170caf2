"""Hypothesis cross-checks for the round-9 seventh/eighth waves:
pure-python references for minmax decimation, attribution, OOV, alert
episodes, SLO burn, and the k-means iteration path."""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

HOUR = 3_600_000

_SET = dict(max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck))


# --------------------------------------------------- minmax decimate


@settings(**_SET)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=399),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda p: p[0],
    )
)
def test_minmax_decimate_matches_python(spark, pts):
    """Per bucket: min/max value with earliest-ts tie-break, count —
    against a literal python pass."""
    from v3io_tsdb_spark.operators.interpolate import minmax_decimate

    df = spark.createDataFrame(
        [("m", "u", t, v) for t, v in pts],
        "name string, uid string, t long, value double",
    )
    got = {r["t"]: r for r in
           minmax_decimate(df, ts_col="t", step_ms=100, from_ms=0).collect()}
    buckets = defaultdict(list)
    for t, v in pts:
        buckets[(t // 100) * 100].append((t, v))
    assert set(got) == set(buckets)
    for b, items in buckets.items():
        r = got[b]
        mn = min(items, key=lambda p: (p[1], p[0]))
        mx = max(items, key=lambda p: (p[1], -p[0]))
        assert (r["count"], r["min_v"], r["min_ts"]) == (len(items), mn[1], mn[0])
        assert (r["max_v"], r["max_ts"]) == (mx[1], mx[0])


# ------------------------------------------------------- attribution


@settings(**_SET)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=3000),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_attribution_matches_python(spark, evs):
    """Report == a literal python last-non-conversion-within-window
    walk, on arbitrary event streams; the '(none)' row keeps the total
    equal to the conversion count."""
    from v3io_tsdb_spark.operators.funnel import attribution_report

    rows = [(u, t, e, i) for i, (u, t, e) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )
    got = {r["touch_type"]: r["conversions"] for r in
           attribution_report(df, "purchase", window_ms=500).collect()}

    by_user = defaultdict(list)
    for u, t, e, i in rows:
        by_user[u].append((t, e, i))
    want = Counter()
    n_conv = 0
    for u, es in by_user.items():
        es.sort()
        for j, (t, e, _) in enumerate(es):
            if e != "purchase":
                continue
            n_conv += 1
            touch = None
            for pt, pe, _ in es[:j]:
                if pe != "purchase":
                    touch = (pt, pe)
            if touch is not None and t - touch[0] <= 500:
                want[touch[1]] += 1
            else:
                want["(none)"] += 1
    assert got == dict(want)
    assert sum(got.values()) == n_conv


# ------------------------------------------------------------- OOV


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    v=st.integers(min_value=1, max_value=6),
)
def test_oov_matches_python_vocab_cut(spark, docs, v):
    """OOV counts == python against the (count desc, token asc) top-V
    vocabulary on arbitrary corpora."""
    from v3io_tsdb_spark.functions.text import oov_rate

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in oov_rate(df, top_v=v).collect()}
    counts = Counter(tok for d in docs for tok in d)
    vocab = set(t for t, _ in sorted(counts.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:v])
    for i, d in enumerate(docs):
        oov = sum(1 for tok in d if tok not in vocab)
        assert got[i]["n_tokens"] == len(d)
        assert got[i]["n_oov"] == oov


# ----------------------------------------------------- alert episodes


@settings(**_SET)
@given(flags=st.lists(st.booleans(), min_size=1, max_size=30))
def test_alert_episodes_match_python_islands(spark, flags):
    """Episode set == a literal python run-length scan of the flag
    sequence."""
    from v3io_tsdb_spark.operators.anomaly import alert_episodes

    rows = [("m", h * HOUR, int(f), float(h)) for h, f in enumerate(flags)]
    df = spark.createDataFrame(rows, "name string, t long, flag int, v double")
    got = sorted(
        (r["start_t"] // HOUR, r["end_t"] // HOUR, r["n_buckets"], r["peak"])
        for r in alert_episodes(df, ("name",), "t", "flag", "v", HOUR).collect()
    )
    want, run = [], None
    for h, f in enumerate(flags):
        if f:
            if run is None:
                run = [h, h]
            else:
                run[1] = h
        elif run is not None:
            want.append((run[0], run[1], run[1] - run[0] + 1, float(run[1])))
            run = None
    if run is not None:
        want.append((run[0], run[1], run[1] - run[0] + 1, float(run[1])))
    assert got == sorted(want)


# ------------------------------------------------------ SLO burn


@settings(**_SET)
@given(
    errs=st.lists(st.integers(min_value=0, max_value=5), min_size=1,
                  max_size=12)
)
def test_slo_burn_matches_python(spark, errs):
    """Burn ratios == python trailing-window sums over the hourly
    (errors, total) grid — total fixed at 10 events/hour, errors
    arbitrary — with the page flag thresholded on the same rounded
    values."""
    from v3io_tsdb_spark.operators.counters import slo_burn_rate

    rows = []
    for h, ne in enumerate(errs):
        for i in range(ne):
            rows.append(("error", "u", h * HOUR + i, 1.0))
        for i in range(10 - ne):
            rows.append(("ok", "u", h * HOUR + 100 + i, 1.0))
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    got = {r["t"] // HOUR: r for r in slo_burn_rate(
        df, error_name="error", ts_col="t", step_ms=HOUR, from_ms=0,
        short_buckets=2, long_buckets=4, slo_target=0.9,
        burn_threshold=3.0,
    ).collect()}
    for h in range(len(errs)):
        lo_s, lo_l = max(0, h - 1), max(0, h - 3)
        bs = sum(errs[lo_s:h + 1]) / (10.0 * (h - lo_s + 1)) / 0.1
        bl = sum(errs[lo_l:h + 1]) / (10.0 * (h - lo_l + 1)) / 0.1
        assert math.isclose(got[h]["burn_short"], bs, rel_tol=1e-9)
        assert math.isclose(got[h]["burn_long"], bl, rel_tol=1e-9)
        want_page = int(round(bs + 1e-9, 6) > 3.0 and round(bl + 1e-9, 6) > 3.0)
        assert got[h]["page"] == want_page


# --------------------------------------------------------- k-means


def _py_kmeans(vecs, k, n_iter):
    import math as m

    def r6(x):
        y = x + 1e-9
        return (m.floor(y * 1e6 + 0.5) / 1e6 if y >= 0
                else -m.floor(-y * 1e6 + 0.5) / 1e6)

    def rh(x):
        # round half away from zero (the engines' round)
        return (m.floor(x + 0.5) if x >= 0 else -m.floor(-x + 0.5))

    def qmean(col):
        # order-free integer mean: 2^15-quantized coordinate sums
        # (similarity.kmeans_lloyd, ADVICE r11)
        return r6(sum(rh(x * 32768.0) for x in col) / (32768.0 * len(col)))

    cents = [(i, list(vecs[i][1])) for i in range(min(k, len(vecs)))]
    for it in range(n_iter):
        assign = {}
        for vid, v in vecs:
            best = None
            for ci, cv in cents:
                d = r6(sum((a - b) ** 2 for a, b in zip(v, cv)))
                if best is None or d < best[0]:
                    best = (d, ci)
            assign[vid] = best
        if it < n_iter - 1:
            groups = defaultdict(list)
            for vid, v in vecs:
                groups[assign[vid][1]].append(v)
            cents = [
                (ci, [qmean(col) for col in zip(*vs)])
                for ci, vs in sorted(groups.items())
            ]
    prof = defaultdict(lambda: [0, 0.0])
    for vid, _ in vecs:
        d, ci = assign[vid]
        prof[ci][0] += 1
        prof[ci][1] += d
    return {ci: (n, round(s + 1e-9, 4)) for ci, (n, s) in prof.items()}


@settings(**_SET)
@given(
    vecs=st.lists(
        st.tuples(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_kmeans_matches_python_iteration_path(spark, vecs):
    """The full 3-round iteration path (assignments, dead clusters,
    inertia) == a literal python Lloyd mirror using the same 6dp
    rounding boundaries — the property that makes the SQL-unrolled
    oracle trustworthy."""
    from v3io_tsdb_spark.functions.similarity import kmeans_lloyd

    data = [(i, [x, y]) for i, (x, y) in enumerate(vecs)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>"
    )
    got = {r["centroid_id"]: (r["n_vecs"], r["inertia"])
           for r in kmeans_lloyd(df, k=2, n_iter=3).collect()}
    want = _py_kmeans(data, 2, 3)
    assert set(got) == set(want)
    for ci in want:
        assert got[ci][0] == want[ci][0]
        assert math.isclose(got[ci][1], want[ci][1], abs_tol=1e-6)


# ------------------------------------- seasonally-adjusted anomaly


@settings(**_SET)
@given(
    xs=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=14,
        max_size=21,
    ),
    template=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=7,
        max_size=7,
    ),
)
def test_adjusted_anomaly_is_invariant_to_weekly_template(spark, template, xs):
    """Adding ANY 7-periodic template to a series leaves the residuals
    (hence z and flags) unchanged: the template shifts the centered MA
    by its mean and the seasonal index by its deviation, which cancel
    exactly. This is the algebraic identity behind 'the Monday rush
    never flags' — tested as an invariance, not an example."""
    from v3io_tsdb_spark.operators.anomaly import seasonal_adjusted_flags

    DAY = 86_400_000

    def run(vals):
        rows = [("m", "u", i * DAY, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "name string, uid string, t long, value double"
        )
        return {
            r["t"]: (r["residual"], r["z"], r["flag"])
            for r in seasonal_adjusted_flags(
                df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
                from_ms=0, period=7, k=2.0,
            ).collect()
        }

    plain = run(xs)
    shifted = run([x + template[i % 7] for i, x in enumerate(xs)])
    assert set(plain) == set(shifted)
    for t in plain:
        pr, pz, pf = plain[t]
        sr, sz, sf = shifted[t]
        assert math.isclose(pr, sr, rel_tol=1e-7, abs_tol=1e-6), (t, pr, sr)
        if pz is None or sz is None:
            assert pz == sz
        else:
            assert math.isclose(pz, sz, rel_tol=1e-6, abs_tol=1e-6)
        assert pf == sf
