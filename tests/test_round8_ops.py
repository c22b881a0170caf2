"""Round-8 operators: winnowing fingerprints (X71), BM25 retrieval
(X72), embedding group diversity (X73), binary-segmentation
changepoints (X74), slice KL divergence (X75), conversion latency
(X76). Each checked against an independent pure-Python computation on
small constructed inputs (the oracle sweep covers the parquet-scale
hash parity)."""

import math

import pytest
from pyspark.sql import functions as F


# -- winnowing ---------------------------------------------------------------


def _py_winnow(text, k, w):
    import hashlib

    toks = text.lower().split()
    if len(toks) < k:
        return set()
    kh = [
        int(
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15],
            16,
        )
        for i in range(len(toks) - k + 1)
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


@pytest.mark.parametrize(
    "text",
    [
        "a b c d e f g h i j k l m",
        "x x x x x x x x",  # all-equal hashes: leftmost-min rule
        "one two three four five",  # exactly k tokens -> 1 shingle
        "short doc",  # < k tokens -> no fingerprints
        "",
    ],
)
def test_winnow_matches_reference_impl(spark, text):
    from v3io_tsdb_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=5, w=4).collect()
    }
    assert got == _py_winnow(text, 5, 4)


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing >= w+k-1 consecutive
    tokens share at least one fingerprint."""
    from v3io_tsdb_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    df = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, shared + " completely different ending text"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, k=5, w=4)
    fps = (
        out.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") == 2)
        .count()
    )
    assert fps >= 1


# -- BM25 --------------------------------------------------------------------


def test_bm25_matches_reference_impl(spark):
    from v3io_tsdb_spark.functions.text import bm25_topk

    docs = [
        (1, "hash join hash scan"),
        (2, "vector vector vector vector vector"),
        (3, "merge sort filter"),
        (4, "hash"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ("hash", "join", "vector")
    k1, b = 1.2, 0.75
    lens = {d: len(t.split()) for d, t in docs}
    avglen = sum(lens.values()) / len(lens)
    n_docs = len(docs)
    tf = {}
    for d, t in docs:
        for w in t.split():
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq = {
        t: len({d for (d, tt) in tf if tt == t}) for t in terms
    }
    exp = {}
    for (d, t), f_ in tf.items():
        idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        s = idf * f_ * (k1 + 1) / (f_ + k1 * (1 - b + b * lens[d] / avglen))
        exp[d] = exp.get(d, 0.0) + s
    expected = sorted(exp.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    got = bm25_topk(df, terms, k=10).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r in got:
        assert r["score"] == pytest.approx(exp[r["doc_id"]], abs=1e-5)
    hit_counts = {r["doc_id"]: r["n_hit_terms"] for r in got}
    assert hit_counts == {1: 2, 2: 1, 4: 1}


# -- group diversity ---------------------------------------------------------


def test_group_diversity_matches_pairwise_bruteforce(spark):
    import itertools

    from v3io_tsdb_spark.functions.similarity import group_diversity

    vecs = {
        10: [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        20: [[1.0, 2.0], [2.0, 4.0]],  # parallel -> mean cosine 1.0
        30: [[3.0, 4.0]],  # singleton -> null
    }
    rows = [
        (i * 100 + j, g, v)
        for i, (g, vs) in enumerate(vecs.items())
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    got = {
        r["label"]: (r["n"], r["mean_pairwise_cosine"])
        for r in group_diversity(df, "label").collect()
    }

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    for g, vs in vecs.items():
        n, mc = got[g]
        assert n == len(vs)
        if len(vs) < 2:
            assert mc is None
        else:
            pairs = list(itertools.combinations(vs, 2))
            exp = sum(cos(a, b) for a, b in pairs) / len(pairs)
            assert mc == pytest.approx(exp, abs=1e-5)


# -- changepoint -------------------------------------------------------------


def test_changepoint_finds_injected_level_shift(spark):
    from v3io_tsdb_spark.operators.trend import changepoint_binary_seg

    xs = [1.0] * 10 + [5.0] * 10
    rows = [("m", "u", 1000 * i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    r = changepoint_binary_seg(df).collect()[0]
    assert r["change_t"] == 10_000  # first bucket of the new regime
    assert r["pre_mean"] == pytest.approx(1.0)
    assert r["post_mean"] == pytest.approx(5.0)
    # statistic value: |1-5| * sqrt(10*10/20)
    assert r["score"] == pytest.approx(4 * math.sqrt(5.0), abs=1e-4)


def test_changepoint_matches_bruteforce_argmax(spark):
    import random

    from v3io_tsdb_spark.operators.trend import changepoint_binary_seg

    rng = random.Random(7)
    xs = [rng.uniform(0, 10) for _ in range(17)]
    rows = [("m", "u", 100 * i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    m = len(xs)
    best = None
    for i in range(1, m):
        pre = sum(xs[:i]) / i
        post = sum(xs[i:]) / (m - i)
        s = abs(pre - post) * math.sqrt(i * (m - i) / m)
        if best is None or round(s, 6) > round(best[1], 6):
            best = (i, s)
    r = changepoint_binary_seg(df).collect()[0]
    assert r["change_t"] == 100 * best[0]
    assert r["score"] == pytest.approx(best[1], abs=1e-5)


def test_changepoint_single_bucket_series_is_null(spark):
    from v3io_tsdb_spark.operators.trend import changepoint_binary_seg

    df = spark.createDataFrame(
        [("m", "u", 0, 1.0)], "name string, uid string, t long, x double"
    )
    r = changepoint_binary_seg(df).collect()[0]
    assert r["change_t"] is None and r["score"] is None


# -- slice KL ----------------------------------------------------------------


def test_slice_kl_zero_for_identical_slices_and_positive_for_skew(spark):
    from v3io_tsdb_spark.functions.text import slice_kl_divergence

    df = spark.createDataFrame(
        [
            (1, "a", "x y z"),
            (2, "b", "x y z"),  # same distribution as corpus -> KL 0
            (3, "c", "x x x x x x"),  # skewed
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r["kl"] for r in slice_kl_divergence(df).collect()}
    # corpus: x:8 y:2 z:2 (n=12). slices a,b = uniform thirds.
    p, qx, qo = 1 / 3, 8 / 12, 2 / 12
    exp_ab = p * math.log(p / qx) + 2 * p * math.log(p / qo)
    assert got["a"] == pytest.approx(exp_ab, abs=1e-5)
    assert got["b"] == pytest.approx(exp_ab, abs=1e-5)
    assert got["c"] == pytest.approx(math.log(1 / (8 / 12)), abs=1e-5)


# -- conversion latency ------------------------------------------------------


def test_conversion_latency_asof_pairing(spark):
    from v3io_tsdb_spark.operators.funnel import conversion_latency

    rows = [
        # user 1: view@10, purchase@25 (lat 15), view@30, purchase@31 (lat 1)
        (1, "view", 10), (1, "purchase", 25), (1, "view", 30),
        (1, "purchase", 31),
        # user 2: purchase with NO prior view -> counted, null latency
        (2, "purchase", 40),
        # user 3: view only -> no row
        (3, "view", 5),
        # noise event types are ignored
        (1, "click", 24),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = conversion_latency(df, bucket_ms=1000, anchor_ms=0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t"] == 0 and r["n"] == 3 and r["n_converted"] == 2
    assert r["avg_latency_ms"] == pytest.approx(8.0)
    assert r["min_latency_ms"] == 1 and r["max_latency_ms"] == 15


def test_conversion_latency_same_ts_view_not_used(spark):
    """A from-event at the conversion's exact timestamp is NOT a prior
    (deterministic (ts, type) total order)."""
    from v3io_tsdb_spark.operators.funnel import conversion_latency

    df = spark.createDataFrame(
        [(1, "view", 50), (1, "purchase", 50)],
        "user_id long, event_type string, ts long",
    )
    r = conversion_latency(df, bucket_ms=1000, anchor_ms=0).collect()[0]
    assert r["n"] == 1 and r["n_converted"] == 0


def test_winnow_matches_pairs_and_cap(spark):
    from v3io_tsdb_spark.functions.text import winnow_matches

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, shared + " unique tail one here now"),
            (2, shared + " other ending entirely different words"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = winnow_matches(df, k=5, w=4, min_shared=2).collect()
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in pair for pair in got)
    # df-cap: with max_df=1 every fingerprint bucket is dropped
    assert winnow_matches(df, k=5, w=4, min_shared=1, max_df=1).count() == 0


# -- DES forecast ------------------------------------------------------------


def test_des_forecast_matches_literal_recurrence(spark):
    """Closed-form double smoothing == the literal Brown recurrence
    (with the documented 6dp intermediate pinning)."""
    import random

    from v3io_tsdb_spark.operators.trend import des_forecast

    rng = random.Random(11)
    xs = [rng.uniform(0, 50) for _ in range(20)]
    rows = [("m", "u", 100 * i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    alpha = 0.3
    s1 = s2 = None
    exp = []
    for x in xs:
        s1 = x if s1 is None else alpha * x + (1 - alpha) * s1
        s1r = round(s1 + 1e-9, 6)
        s2 = s1r if s2 is None else alpha * s1r + (1 - alpha) * s2
        s2r = round(s2 + 1e-9, 6)
        level = 2 * s1r - s2r
        trend = alpha / (1 - alpha) * (s1r - s2r)
        exp.append((level, trend, level + trend))
    got = sorted(des_forecast(df).collect(), key=lambda r: r["t"])
    for r, (lv, tr, fc) in zip(got, exp):
        assert r["level"] == pytest.approx(lv, abs=1e-4)
        assert r["trend"] == pytest.approx(tr, abs=1e-4)
        assert r["forecast_next"] == pytest.approx(fc, abs=1e-4)


def test_des_forecast_tracks_linear_trend(spark):
    """On a perfectly linear series the one-step-ahead forecast
    converges to the true next value (Brown's removes EWMA's lag)."""
    from v3io_tsdb_spark.operators.trend import des_forecast

    xs = [10.0 + 3.0 * i for i in range(40)]
    rows = [("m", "u", 100 * i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    last = sorted(des_forecast(df).collect(), key=lambda r: r["t"])[-1]
    true_next = 10.0 + 3.0 * 40
    assert abs(last["forecast_next"] - true_next) < 0.5


# -- streaming conversion latency -------------------------------------------


def test_stream_conversion_latency_cross_batch_state(spark, tmp_path):
    """The prior view arriving in an EARLIER micro-batch must still
    pair with a later batch's purchase (state carry), and the emitted
    rows must equal the batch operator on the concatenated feed."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_conversion_latency

    b1 = [(100, "view", "u1"), (150, "purchase", "u1"), (200, "view", "u2")]
    b2 = [(300, "purchase", "u2"), (400, "purchase", "u3"),
          (500, "view", "u1"), (600, "purchase", "u1")]
    src = tmp_path / "in"
    src.mkdir()
    schema = "ts long, event_type string, user_id string"

    def feed(rows, name):
        (src / name).write_text(
            "\n".join(
                json.dumps({"ts": t, "event_type": e, "user_id": u})
                for t, e, u in rows
            )
        )

    feed(b1, "b1.json")
    raw = spark.readStream.schema(schema).json(str(src))
    sink = "conv_sink_test"
    q = (
        stream_conversion_latency(raw)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        feed(b2, "b2.json")
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["t"]): r["lat"]
        for r in spark.table(sink).collect()
    }
    spark.catalog.dropTempView(sink)
    assert got == {
        ("u1", 150): 50,     # same-batch pairing
        ("u2", 300): 100,    # CROSS-batch pairing via state
        ("u3", 400): None,   # no prior view -> null latency
        ("u1", 600): 100,    # state updated by the later view
    }


def test_winnow_index_append_equals_full_build(spark, tmp_path):
    from v3io_tsdb_spark.functions.text import (
        read_winnow_index,
        winnow_append_index,
        winnow_write_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i} zeta eta theta")
         for i in range(8)],
        "doc_id long, text string",
    )
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    winnow_write_index(docs, full)
    winnow_write_index(docs.where("doc_id < 5"), inc)
    winnow_append_index(docs.where("doc_id >= 5"), inc)
    key = lambda df: {  # noqa: E731
        (r["doc_id"], r["pos"], r["fp"]) for r in df.collect()
    }
    assert key(read_winnow_index(spark, inc)) == key(
        read_winnow_index(spark, full)
    )


# -- edge cases --------------------------------------------------------------


def test_bm25_empty_and_no_hit_corpus(spark):
    from v3io_tsdb_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "merge sort filter"), (2, "")], "doc_id long, text string"
    )
    assert bm25_topk(df, ("hash", "join"), k=5).count() == 0


def test_slice_kl_single_slice_is_zero(spark):
    """One slice == the whole corpus: KL must be exactly 0."""
    from v3io_tsdb_spark.functions.text import slice_kl_divergence

    df = spark.createDataFrame(
        [(1, "a", "x y z w"), (2, "a", "x x q")],
        "doc_id long, source string, text string",
    )
    rows = slice_kl_divergence(df).collect()
    assert len(rows) == 1 and rows[0]["kl"] == pytest.approx(0.0, abs=1e-9)


def test_group_diversity_orthonormal_is_zero_mean(spark):
    """d orthonormal vectors: every pairwise cosine is 0."""
    from v3io_tsdb_spark.functions.similarity import group_diversity

    rows = [(i, 1, [1.0 if j == i else 0.0 for j in range(4)])
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    r = group_diversity(df, "label").collect()[0]
    assert r["n"] == 4
    assert r["mean_pairwise_cosine"] == pytest.approx(0.0, abs=1e-9)


def test_conversion_latency_empty_input(spark):
    from v3io_tsdb_spark.operators.funnel import conversion_latency

    df = spark.createDataFrame(
        [], "user_id long, event_type string, ts long"
    )
    assert conversion_latency(df).count() == 0


def test_des_forecast_constant_series_is_flat(spark):
    """Constant series: level == the constant, trend == 0, forecast ==
    the constant (no spurious drift from the double smoothing)."""
    from v3io_tsdb_spark.operators.trend import des_forecast

    rows = [("m", "u", 100 * i, 7.5) for i in range(12)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    for r in des_forecast(df).collect():
        assert r["level"] == pytest.approx(7.5, abs=1e-6)
        assert r["trend"] == pytest.approx(0.0, abs=1e-6)
        assert r["forecast_next"] == pytest.approx(7.5, abs=1e-6)
