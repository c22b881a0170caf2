"""Property tests (hypothesis): the chunking / span-dedup / quality
column expressions must agree with direct Python simulations on
arbitrary word-soup inputs — same discipline as the packing suite."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.text(alphabet="abcxyz0", min_size=1, max_size=6)
texts_strategy = st.lists(
    st.lists(word, min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=12,
)


def _toks(t):
    t = t.strip().lower()
    return t.split() if t else []


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy, chunk=st.integers(2, 12), stride=st.integers(1, 12))
def test_token_chunks_matches_simulation(spark, texts, chunk, stride):
    from v3io_tsdb_spark.functions.chunking import token_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start"], r["n_chunk_tokens"], r["chunk_hash"])
        for r in token_chunks(df, chunk=chunk, stride=stride).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        tk = _toks(t)
        if not tk:
            continue
        n_chunks = 1 + math.ceil(max(0, len(tk) - chunk) / stride)
        for c in range(n_chunks):
            start = c * stride
            sl = tk[start : start + chunk]
            want[(i, c)] = (
                start,
                min(chunk, len(tk) - start),
                hashlib.md5(" ".join(sl).encode()).hexdigest(),
            )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy, n=st.integers(2, 6))
def test_dup_span_stats_matches_simulation(spark, texts, n):
    from v3io_tsdb_spark.functions.chunking import dup_span_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dup_span_stats(df, n=n).collect()
    }
    # simulation: span -> set of docs; dup = span seen in >= 2 docs
    span_docs: dict = {}
    spans_by_doc: dict = {}
    for i, t in enumerate(texts):
        tk = _toks(t)
        spans = [" ".join(tk[j : j + n]) for j in range(max(0, len(tk) - n + 1))]
        spans_by_doc[i] = spans
        for s in set(spans):
            span_docs.setdefault(s, set()).add(i)
    for i, spans in spans_by_doc.items():
        dup = sum(1 for s in spans if len(span_docs[s]) >= 2)
        assert got[i] == (len(spans), dup), (i, got[i], (len(spans), dup))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy)
def test_quality_rules_matches_simulation(spark, texts):
    from v3io_tsdb_spark.functions.text import STOPWORDS, quality_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in quality_rules(df).collect()}
    for i, t in enumerate(texts):
        tk = _toks(t)
        n = len(tk)
        avg = sum(len(w) for w in tk) / n if n else 0.0
        mx = max((len(w) for w in tk), default=0)
        stop = len(set(tk) & set(STOPWORDS["en"]))
        top = max((tk.count(w) for w in set(tk)), default=0) / n if n else 0.0
        r = got[i]
        assert r["n_tokens"] == n
        assert r["max_token_len"] == mx
        assert r["n_stopwords"] == stop
        assert abs(r["top_token_ratio"] - round(top, 6)) <= 1e-6
        want_keep = int(
            15 <= n <= 100000 and 2.0 <= avg <= 8.0 and mx <= 15
            and stop >= 2 and top <= 0.125
        )
        assert r["keep"] == want_keep
