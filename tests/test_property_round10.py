"""Hypothesis cross-checks for the round-10 wave: literal-python
references for predict_linear and drawdown, distribution laws for
Markov k-step and Kneser-Ney, corpus-order invariants for vocab
growth."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY = 86_400_000

_SET = dict(max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck))


def _r6(x: float) -> float:
    y = x + 1e-9
    s = 1.0 if y >= 0 else -1.0
    return s * math.floor(abs(y) * 1e6 + 0.5) / 1e6


@settings(**_SET)
@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=7, max_size=20,
    )
)
def test_predict_linear_matches_python_ols(spark, xs):
    """Each full-window slope/predict must equal the literal python
    least-squares fit over the same 7 rounded grid values."""
    from v3io_tsdb_spark.operators.trend import predict_linear

    rows = [("m", "u", d * DAY, float(v)) for d, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {r["t"] // DAY: r for r in predict_linear(
        df, step_ms=DAY, from_ms=0, lookback=7, horizon=3).collect()}
    grid = [_r6(v) for v in xs]
    for d in range(6, len(xs)):
        w = list(range(d - 6, d + 1))
        n = 7.0
        si, sx = float(sum(w)), sum(grid[i] for i in w)
        six = sum(i * grid[i] for i in w)
        sii = float(sum(i * i for i in w))
        slope = _r6((n * six - si * sx) / (n * sii - si * si))
        pred = _r6(sx / n + slope * (d + 3 - si / n))
        assert out[d]["slope"] == slope
        assert out[d]["predict"] == pred


@settings(**_SET)
@given(
    xs=st.lists(
        st.floats(min_value=0.5, max_value=1000,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=25,
    )
)
def test_drawdown_matches_python_walk(spark, xs):
    """Running peak / dd / max-dd must equal the literal sequential
    walk; with positive values dd always lands in [0, 1)."""
    from v3io_tsdb_spark.operators.trend import drawdown

    rows = [("m", "u", d * DAY, float(v)) for d, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(drawdown(df, step_ms=DAY, from_ms=0).collect(),
                 key=lambda r: r["t"])
    peak, mdd = None, None
    for r, v in zip(out, xs):
        x = _r6(v)
        peak = x if peak is None else max(peak, x)
        dd = _r6((peak - x) / peak)
        mdd = dd if mdd is None else max(mdd, dd)
        assert r["peak"] == peak and r["dd"] == dd and r["max_dd"] == mdd
        assert 0.0 <= r["dd"] < 1.0


@settings(**_SET)
@given(
    walk=st.lists(st.sampled_from("ABC"), min_size=3, max_size=30),
    k=st.integers(min_value=1, max_value=4),
)
def test_markov_kstep_mass_conservation_on_cyclic_chain(spark, walk, k):
    """Append the walk's first TWO states so every reachable state has
    an outgoing edge (the last state repeats an earlier from-state):
    total mass must then survive every step within the rounding
    envelope (k rounds of ±5e-7 per state)."""
    from v3io_tsdb_spark.operators.paths import markov_kstep, markov_transitions

    walk = walk + [walk[0], walk[1]]
    ev = spark.createDataFrame(
        [(1, 1000 * i, s, i) for i, s in enumerate(walk)],
        "user_id long, ts_ms long, event_type string, event_id long",
    )
    out = markov_kstep(markov_transitions(ev), k=k).collect()
    assert out, "cyclic chain must retain mass"
    tm = out[0]["total_mass"]
    assert abs(tm - 1.0) < 5e-6 * k + 5e-6


@settings(**_SET)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=2, max_size=10)
        .map(lambda ws: " ".join(ws)),
        min_size=1, max_size=12,
    )
)
def test_kn_bigram_is_proper_distribution(spark, texts):
    """Kneser-Ney is a proper conditional distribution: every bigram
    probability is in (0, 1], so every doc's mean log-probability is
    <= 0 (up to the 6dp rounding nudge)."""
    from v3io_tsdb_spark.functions.text import kn_bigram_logprob

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = kn_bigram_logprob(docs).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r["mean_logprob"] <= 1e-6


@settings(**_SET)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("pqrstuv"), min_size=0, max_size=6)
        .map(lambda ws: " ".join(ws)),
        min_size=2, max_size=15,
    )
)
def test_vocab_growth_invariants(spark, docs):
    """Monotone nondecreasing curves; the last checkpoint equals the
    literal whole-corpus counts."""
    from v3io_tsdb_spark.functions.text import vocab_growth

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = sorted(vocab_growth(df).collect(), key=lambda r: r["cp"])
    for a, b in zip(out, out[1:]):
        assert a["vocab"] <= b["vocab"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["n_docs"] <= b["n_docs"]
    toks = [t.split() for t in docs if t.strip()]
    assert out[-1]["n_tokens"] == sum(len(t) for t in toks)
    assert out[-1]["vocab"] == len({w for t in toks for w in t})
    assert out[-1]["n_docs"] == len(docs)
