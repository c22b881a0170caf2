"""Hypothesis property tests for the trend/counter operators: the
distributed window formulations must agree with a straight-line pandas
reference on arbitrary series."""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),          # bucket index
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda p: p[0],
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy, alpha=st.floats(min_value=0.05, max_value=0.95))
def test_ewma_matches_pandas_recurrence(spark, pts, alpha):
    from v3io_tsdb_spark.operators.trend import ewma_over_buckets

    df = spark.createDataFrame(
        [("m", "u", t, float(x)) for t, x in pts],
        "name string, uid string, t long, x double",
    )
    got = {r["t"]: r["ewma"] for r in ewma_over_buckets(df, alpha=alpha).collect()}
    ordered = sorted(pts)
    s = None
    for t, x in ordered:
        s = float(x) if s is None else alpha * float(x) + (1 - alpha) * s
        assert got[t] == pytest.approx(s, rel=1e-9, abs=1e-9), (t, alpha)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_counter_resets_matches_pandas(spark, pts):
    from v3io_tsdb_spark.operators.counters import counter_resets_changes

    STEP = 10
    df = spark.createDataFrame(
        [("c", "u", t, float(x)) for t, x in pts],
        "name string, uid string, t long, value double",
    )
    out = {r["t"]: (r["resets"], r["changes"], r["count"])
           for r in counter_resets_changes(df, ts_col="t", step_ms=STEP).collect()}
    pdf = pd.DataFrame(sorted(pts), columns=["t", "v"])
    pdf["prev"] = pdf["v"].shift(1)
    agg = {}
    for _, r in pdf.iterrows():
        b = (int(r["t"]) // STEP) * STEP
        res, chg, cnt = agg.get(b, (0, 0, 0))
        if not math.isnan(r["prev"]):
            res += int(r["v"] < r["prev"])
            chg += int(r["v"] != r["prev"])
        agg[b] = (res, chg, cnt + 1)
    assert out == agg


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_gap_report_matches_pandas(spark, pts):
    from v3io_tsdb_spark.operators.gaps import gap_report

    STEP = 7
    df = spark.createDataFrame(
        [("m", "u", t) for t, _ in pts], "name string, uid string, t long"
    )
    r = gap_report(df, ts_col="t", step_ms=STEP).collect()[0]
    ts = sorted(t for t, _ in pts)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    assert r["max_gap_ms"] == (max(gaps) if gaps else None)
    assert r["present"] == len({t // STEP for t in ts})
    assert r["expected"] == ts[-1] // STEP - ts[0] // STEP + 1
    assert r["missing"] == r["expected"] - r["present"]


events_strategy = st.lists(
    st.tuples(st.integers(min_value=1, max_value=6),      # user
              st.integers(min_value=0, max_value=40)),    # time
    min_size=1, max_size=60,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_retention_cohorts_matches_pandas(spark, evs):
    from v3io_tsdb_spark.operators.cohorts import retention_cohorts

    W = 10
    df = spark.createDataFrame(evs, "user_id long, ts_ms long")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(df, week_ms=W).collect()}
    first = {}
    for u, t in evs:
        first[u] = min(first.get(u, t), t)
    exp = {}
    for u, t in set(evs):
        cw = (first[u] // W) * W
        off = (t // W) * W - cw
        exp.setdefault((cw, off // W), set()).add(u)
    assert got == {k: len(v) for k, v in exp.items()}


# -- round-7 operators ------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3 * 86_400_000 - 1),  # ts ms
        st.floats(min_value=-50, max_value=50,
                  allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda p: p[0],
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=events_strategy)
def test_irate_idelta_matches_python_reference(spark, pts):
    """irate/idelta must equal the straight-line per-bucket simulation:
    sort the bucket's samples, take the last delta; <2 samples → null."""
    from v3io_tsdb_spark.operators.counters import irate_idelta

    DAY = 86_400_000
    df = spark.createDataFrame(
        [("m", "u", t, float(v)) for t, v in pts],
        "name string, uid string, t long, value double",
    )
    got = {r["t"]: r for r in irate_idelta(df, step_ms=DAY, from_ms=0).collect()}

    by_bucket: dict = {}
    for t, v in pts:
        by_bucket.setdefault((t // DAY) * DAY, []).append((t, float(v)))
    for bt, samples in by_bucket.items():
        samples.sort()
        r = got[bt]
        assert r["count"] == len(samples)
        if len(samples) < 2:
            assert r["idelta"] is None and r["irate"] is None
        else:
            (t1, v1), (t2, v2) = samples[-2], samples[-1]
            assert r["idelta"] == pytest.approx(v2 - v1, abs=1e-9)
            assert r["irate"] == pytest.approx((v2 - v1) / ((t2 - t1) / 1000.0),
                                               abs=1e-9)
    assert set(got) == set(by_bucket)


corpus_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=corpus_strategy)
def test_unigram_logprob_matches_python_reference(spark, texts):
    """Mean unigram log-prob must match the pure-python add-alpha model
    over the same whitespace tokenization."""
    from v3io_tsdb_spark.functions.text import unigram_logprob

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df, alpha=0.5).collect()}

    def toks(s):
        s = s.strip().lower()
        return s.split() if s else []

    corpus: dict = {}
    for s in texts:
        for w in toks(s):
            corpus[w] = corpus.get(w, 0) + 1
    N, V = sum(corpus.values()), len(corpus)
    for i, s in enumerate(texts):
        ws = toks(s)
        if not ws:
            assert i not in got  # empty docs contribute no (doc, term) rows
            continue
        # integer micro-nat quantization (text.micro_nats, VERDICT r11 #2)
        want = sum(
            round(math.log((corpus[w] + 0.5) / (N + 0.5 * V)) * 1e6)
            for w in ws
        ) / (1e6 * len(ws))
        assert got[i]["n_tokens"] == len(ws)
        assert got[i]["mean_logprob"] == pytest.approx(want, abs=1e-12)
