"""Property tests (hypothesis) for the round-8 operators: winnowing
must agree with a direct Python simulation AND honor the paper's match
guarantee on arbitrary word soup; the changepoint argmax must agree
with a brute-force scan on arbitrary series."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.text(alphabet="abcxyz0", min_size=1, max_size=6)
texts_strategy = st.lists(
    st.lists(word, min_size=0, max_size=40).map(" ".join),
    min_size=1,
    max_size=8,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text, k, w):
    toks = text.strip().lower().split() if text.strip() else []
    if len(toks) < k:
        return set()
    kh = [
        _h60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    if len(kh) < w:
        m = min(kh)
        return {(kh.index(m), m)}
    out = set()
    for j in range(len(kh) - w + 1):
        win = kh[j : j + w]
        m = min(win)
        out.add((j + win.index(m), m))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy, k=st.integers(2, 6), w=st.integers(2, 6))
def test_winnow_matches_simulation(spark, texts, k, w):
    from v3io_tsdb_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {
        i: _py_winnow(t, k, w)
        for i, t in enumerate(texts)
        if _py_winnow(t, k, w)
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    shared=st.lists(word, min_size=8, max_size=14).map(" ".join),
    pre=st.lists(word, min_size=0, max_size=10).map(" ".join),
    post=st.lists(word, min_size=0, max_size=10).map(" ".join),
)
def test_winnow_guarantee_property(spark, shared, pre, post):
    """Paper guarantee: any shared token run of length >= w+k-1 (here
    8 = 4+5-1, by construction) yields a common fingerprint between
    the two documents."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.functions.text import winnow_fingerprints

    d1 = (pre + " " + shared).strip()
    d2 = (shared + " " + post).strip()
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    both = (
        winnow_fingerprints(df, k=5, w=4)
        .groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") == 2)
        .count()
    )
    assert both >= 1


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=2,
        max_size=24,
    )
)
def test_changepoint_matches_bruteforce_property(spark, xs):
    from v3io_tsdb_spark.operators.trend import changepoint_binary_seg

    rows = [("m", "u", 100 * i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "name string, uid string, t long, x double"
    )
    m = len(xs)
    best = None
    for i in range(1, m):
        pre = sum(xs[:i]) / i
        post = sum(xs[i:]) / (m - i)
        s = abs(pre - post) * math.sqrt(i * (m - i) / m)
        key = round(s + 1e-9, 6)
        if best is None or key > best[0]:
            best = (key, i, s)
    r = changepoint_binary_seg(df).collect()[0]
    assert r["change_t"] == 100 * best[1]
    assert abs(r["score"] - round(best[2] + 1e-9, 6)) <= 1e-4


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),                      # user
            st.sampled_from(["view", "purchase", "click"]),
            st.integers(0, 50),                     # ts (collisions likely)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_conversion_latency_matches_simulation(spark, events):
    """Batch as-of pairing == a direct simulation over the (ts, type)
    total order, including same-timestamp ties and absent priors."""
    from v3io_tsdb_spark.operators.funnel import conversion_latency

    df = spark.createDataFrame(
        events, "user_id long, event_type string, ts long"
    )
    got = {
        r["t"]: (r["n"], r["n_converted"], r["min_latency_ms"],
                 r["max_latency_ms"])
        for r in conversion_latency(df, bucket_ms=10, anchor_ms=0).collect()
    }
    # simulation: per user, process in (ts, type) order
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, e, t in events:
        if e in ("view", "purchase"):
            per_user[u].append((t, e))
    lats = []  # (bucket, lat-or-None)
    for u, evs in per_user.items():
        last_view = None
        for t, e in sorted(evs):
            if e == "purchase":
                lats.append((t // 10 * 10,
                             t - last_view if last_view is not None else None))
            else:
                last_view = t if last_view is None else max(last_view, t)
    want = {}
    for b, lat in lats:
        n, conv, mn, mx = want.get(b, (0, 0, None, None))
        n += 1
        if lat is not None:
            conv += 1
            mn = lat if mn is None else min(mn, lat)
            mx = lat if mx is None else max(mx, lat)
        want[b] = (n, conv, mn, mx)
    assert got == want
