"""Round-9 second wave: robust MAD anomaly flags, value heatmap,
trapezoid integral, Zipf fit, logprob profile, PMI co-occurrence, and
centroid assignment — goldens plus the semantic properties each
operator exists to guarantee."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- MAD


def _mad_rows(spark, xs, name="m", uid="u"):
    rows = [(name, uid, 1000 * i, float(x)) for i, x in enumerate(xs)]
    return spark.createDataFrame(rows, "name string, uid string, t long, x double")


def test_mad_flags_golden_zero_mad(spark):
    """Hand-computed degenerate case: xs = [10,10,10,10,100] has
    median=10, devs=[0,0,0,0,90], MAD=0. robust_z is null everywhere
    (the ratio is unbounded — no magnitude verdict), but the FLAG
    still follows the strict Hampel inequality dev > 0: when >50% of
    buckets sit exactly at the median, any departure is anomalous."""
    from v3io_tsdb_spark.operators.anomaly import robust_mad_flags

    out = robust_mad_flags(_mad_rows(spark, [10, 10, 10, 10, 100])).collect()
    assert all(r["robust_z"] is None for r in out)
    got = {r["x"]: r["is_anomaly"] for r in out}
    assert got[100.0] is True
    assert all(v is False for x, v in got.items() if x != 100.0)
    assert all(r["med"] == 10.0 and r["mad"] == 0.0 for r in out)


def test_mad_flags_outlier_detected_and_median_unmoved(spark):
    """xs = [10,11,9,10,12,8,10,100]: med=10, devs=[0,1,1,0,2,2,0,90],
    MAD=1 -> the 100 bucket scores z=90/1.4826 and flags; every other
    bucket stays below 3."""
    from v3io_tsdb_spark.operators.anomaly import robust_mad_flags

    out = robust_mad_flags(_mad_rows(spark, [10, 11, 9, 10, 12, 8, 10, 100]))
    got = {r["x"]: r for r in out.collect()}
    assert got[100.0]["is_anomaly"] is True
    assert got[100.0]["robust_z"] == pytest.approx(90 / 1.4826, abs=1e-3)
    for x, r in got.items():
        if x != 100.0:
            assert r["is_anomaly"] is False
    assert got[100.0]["med"] == 10.0 and got[100.0]["mad"] == 1.0


def test_mad_breakdown_beats_zscore(spark):
    """The reason this operator exists: one extreme bucket inflates the
    mean/stddev yardstick enough to hide itself from a 3-sigma global
    z-test, but not from median/MAD."""
    from v3io_tsdb_spark.operators.anomaly import robust_mad_flags

    xs = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 500.0]
    mean = sum(xs) / len(xs)
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (len(xs) - 1))
    assert abs(500.0 - mean) / sd < 3  # global z misses it
    out = robust_mad_flags(_mad_rows(spark, xs)).where("is_anomaly").collect()
    assert [r["x"] for r in out] == [500.0]


def test_mad_is_per_series(spark):
    """Stats never leak across series: a level-10 series and a level-
    1000 series each flag only their own outliers."""
    from v3io_tsdb_spark.operators.anomaly import robust_mad_flags

    a = [(("m", "a"), x) for x in [10, 11, 9, 10, 12, 8, 10, 100]]
    b = [(("m", "b"), x) for x in [1000, 1001, 999, 1000, 1002, 998, 1000]]
    rows = [
        (s[0], s[1], 1000 * i, float(x)) for i, (s, x) in enumerate(a + b)
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    out = robust_mad_flags(df).where("is_anomaly").collect()
    assert [(r["uid"], r["x"]) for r in out] == [("a", 100.0)]


# ------------------------------------------------------------ heatmap


def test_value_heatmap_golden(spark):
    from v3io_tsdb_spark.functions.histogram import value_heatmap

    rows = [
        ("a", 500, 5.0),    # day 0, bucket 0
        ("a", 600, 15.0),   # day 0, bucket 10
        ("a", 86_400_500, 15.0),  # day 1, bucket 10
        ("a", 700, 9.99),   # day 0, bucket 0
        ("b", 800, 25.0),   # day 0, bucket 20
    ]
    df = spark.createDataFrame(rows, "name string, ts_ms long, value double")
    out = value_heatmap(
        df, "value", 10.0, step_ms=86_400_000, group_cols=("name",)
    )
    got = {(r["name"], r["t"], r["bucket_lo"]): r["n"] for r in out.collect()}
    assert got == {
        ("a", 0, 0.0): 2,
        ("a", 0, 10.0): 1,
        ("a", 86_400_000, 10.0): 1,
        ("b", 0, 20.0): 1,
    }


def test_value_heatmap_negative_values_floor_down(spark):
    """floor (not truncation): -5 belongs to bucket [-10, 0)."""
    from v3io_tsdb_spark.functions.histogram import value_heatmap

    df = spark.createDataFrame(
        [("a", 0, -5.0), ("a", 1, -10.0)], "name string, ts_ms long, value double"
    )
    out = value_heatmap(df, "value", 10.0, group_cols=("name",))
    assert {r["bucket_lo"] for r in out.collect()} == {-10.0}


# ----------------------------------------------------------- integral


def test_trapezoid_integral_golden(spark):
    """Two segments by hand: (0s,10)->(10s,20) area 150, (10s,20)->
    (30s,10) area 300; total 450 value-seconds, 2 segments."""
    from v3io_tsdb_spark.operators.trend import trapezoid_integral

    rows = [("a", "u", 0, 10.0), ("a", "u", 10_000, 20.0), ("a", "u", 30_000, 10.0)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    out = trapezoid_integral(df).collect()
    assert len(out) == 1
    assert out[0]["n_seg"] == 2
    assert out[0]["auc"] == pytest.approx(450.0, abs=1e-3)


def test_trapezoid_constant_series_is_level_times_span(spark):
    """For constant x=c the trapezoid is exact: auc = c * span_sec."""
    from v3io_tsdb_spark.operators.trend import trapezoid_integral

    ts = [0, 7_000, 11_000, 40_000, 41_000]
    rows = [("a", "u", t, 42.0) for t in ts]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    out = trapezoid_integral(df).collect()[0]
    assert out["auc"] == pytest.approx(42.0 * 41.0, abs=1e-3)
    assert out["n_seg"] == len(ts) - 1


def test_trapezoid_pairs_never_span_buckets(spark):
    """A pair crossing the bucket edge contributes to NO bucket: the
    integral never reads outside its own wall-clock span."""
    from v3io_tsdb_spark.operators.trend import trapezoid_integral

    day = 86_400_000
    rows = [
        ("a", "u", day - 2_000, 10.0),
        ("a", "u", day + 2_000, 10.0),  # crosses the edge -> dropped
        ("a", "u", day + 5_000, 10.0),  # same-day pair with previous
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    got = {r["t"]: r for r in trapezoid_integral(df).collect()}
    assert list(got) == [day]
    assert got[day]["n_seg"] == 1
    assert got[day]["auc"] == pytest.approx(30.0, abs=1e-3)


# --------------------------------------------------------------- Zipf


def test_zipf_fit_recovers_planted_slope(spark):
    """Corpus with counts c(rank) = round(1000 * rank^-0.8): the
    regression must recover slope ~ -0.8 with r2 ~ 1."""
    from v3io_tsdb_spark.functions.text import zipf_fit

    words = []
    for rank in range(1, 21):
        c = round(1000 * rank ** -0.8)
        words += [f"w{rank:02d}"] * c
    # one doc per 50 words to keep rows small
    docs = [
        (i, " ".join(words[i * 50 : (i + 1) * 50]))
        for i in range((len(words) + 49) // 50)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = zipf_fit(df).collect()[0]
    assert out["n_terms"] == 20
    assert out["slope"] == pytest.approx(-0.8, abs=0.02)
    assert out["r2"] > 0.999


def test_zipf_fit_top_n_cut(spark):
    """Only the top_n most frequent terms enter the fit; rank ties
    break on the term string so the cut is deterministic."""
    from v3io_tsdb_spark.functions.text import zipf_fit

    df = spark.createDataFrame(
        [(1, "a a a b b c d e f g")], "doc_id long, text string"
    )
    out = zipf_fit(df, top_n=3).collect()[0]
    # top-3 by (count desc, term): a(3), b(2), c(1) — d..g tie with c
    # at count 1 but sort after it
    assert out["n_terms"] == 3


# ----------------------------------------------------- logprob profile


def test_logprob_profile_shares_and_consistency(spark):
    """Token shares over all cells sum to 1; bins agree with a direct
    unigram_logprob pass binned in Python."""
    from v3io_tsdb_spark.functions.text import logprob_profile, unigram_logprob

    rows = [
        (1, "a", "the the the cat"),
        (2, "a", "the dog sat"),
        (3, "b", "rare unique tokens here"),
        (4, "b", "the the the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = logprob_profile(df).collect()
    assert sum(r["token_share"] for r in out) == pytest.approx(1.0, abs=1e-5)
    direct = {
        r["doc_id"]: (math.floor(round(r["mean_logprob"] + 1e-9, 6) / 0.5) * 0.5)
        for r in unigram_logprob(df).collect()
    }
    src = {1: "a", 2: "a", 3: "b", 4: "b"}
    from collections import Counter

    want = Counter((direct[d], src[d]) for d in direct)
    got = {(r["bin_lo"], r["source"]): r["n_docs"] for r in out}
    assert got == dict(want)


# ---------------------------------------------------------------- PMI


def test_cooccur_pmi_planted_template(spark):
    """Six docs share a planted two-phrase template; filler trigrams
    appear in fewer docs. The planted pair must surface with the
    exact hand-computed PMI ln(N*c_ab/(c_a*c_b))."""
    from v3io_tsdb_spark.functions.text import cooccur_pmi

    tmpl = "alpha beta gamma ... delta epsilon zeta"
    docs = [(i, f"{tmpl} filler{i} x{i} y{i}") for i in range(6)]
    # pad corpus with unrelated docs so N > co-occurrence counts
    docs += [(100 + i, f"noise{i} a b c d e f g h") for i in range(14)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccur_pmi(df, min_df=4, max_df=100, min_pair=3).collect()
    got = {(r["term_a"], r["term_b"]): r for r in out}
    key = ("alpha beta gamma", "delta epsilon zeta")
    assert key in got
    r = got[key]
    assert (r["c_a"], r["c_b"], r["c_ab"]) == (6, 6, 6)
    assert r["pmi"] == pytest.approx(math.log(20 * 6 / 36), abs=1e-5)


def test_cooccur_pmi_df_caps(spark):
    """Terms outside [min_df, max_df] never reach the pair join: a
    boilerplate trigram present in every doc produces no pairs."""
    from v3io_tsdb_spark.functions.text import cooccur_pmi

    docs = [(i, f"same boiler plate every doc tail{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccur_pmi(df, min_df=2, max_df=5, min_pair=2).collect()
    terms = {t for r in out for t in (r["term_a"], r["term_b"])}
    assert "same boiler plate" not in terms and not terms


# ----------------------------------------------------------- centroid


def test_centroid_profile_assignment(spark):
    """Vectors built parallel to two orthogonal anchors assign to the
    parallel anchor with cosine 1.0; counts partition the nonzero
    corpus."""
    from v3io_tsdb_spark.functions.similarity import centroid_profile

    rows = [
        (0, [1.0, 0.0]),       # anchor 0
        (1, [0.0, 1.0]),       # anchor 1
        (2, [5.0, 0.0]),       # -> anchor 0
        (3, [0.0, 0.25]),      # -> anchor 1
        (4, [2.0, 0.0]),       # -> anchor 0
        (5, [0.0, 0.0]),       # zero vector: excluded everywhere
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["centroid_id"]: r for r in centroid_profile(df, n_centroids=2).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n"] == 3 and out[1]["n"] == 2
    assert out[0]["mean_cos"] == pytest.approx(1.0, abs=1e-6)
    assert out[1]["min_cos"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["n"] + out[1]["n"] == 5  # all nonzero vectors, once


def test_centroid_profile_tie_breaks_to_lowest_id(spark):
    """A vector equidistant from two anchors lands on the lower
    centroid id (rounded-cosine argmax, id tiebreak)."""
    from v3io_tsdb_spark.functions.similarity import centroid_profile

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 1.0]),  # cos = 1/sqrt(2) to both -> anchor 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["centroid_id"]: r["n"] for r in centroid_profile(df, n_centroids=2).collect()}
    assert out[0] == 2 and out[1] == 1


# ------------------------------------------------------------- Hampel


def test_trailing_hampel_golden(spark):
    """Hand-computed trailing stats, lookback 4, min_history 3:
    hourly counts [5,5,6,5,100,5]. Bucket 4 (n=100): trailing window
    [5,5,6,5] -> med 5.0, devs [0,0,0,1] -> mad 0.0 -> null z but the
    strict flag fires (dev 95 > 0). Bucket 5 (n=5): window
    [5,6,5,100] sorted [5,5,6,100] -> med 5.5, devs [0.5,0.5,0.5,94.5]
    -> mad 0.5, dev 0.5, z = 0.5/(1.4826*0.5), not anomalous."""
    from v3io_tsdb_spark.operators.anomaly import trailing_hampel

    hour = 3_600_000
    rows = []
    for b, n in enumerate([5, 5, 6, 5, 100, 5]):
        rows += [("a", b * hour + i) for i in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    out = {
        r["t"] // hour: r
        for r in trailing_hampel(
            df, lookback=4, min_history=3, k=3.0
        ).collect()
    }
    assert out[0]["med"] is None and out[0]["is_anomaly"] is None
    b4 = out[4]
    assert b4["med"] == 5.0 and b4["mad"] == 0.0
    assert b4["z"] is None and b4["is_anomaly"] == 1
    b5 = out[5]
    assert b5["med"] == 5.5 and b5["mad"] == 0.5
    assert b5["z"] == pytest.approx(0.5 / (1.4826 * 0.5), abs=1e-3)
    assert b5["is_anomaly"] == 0


def test_trailing_hampel_matches_simulation(spark):
    """Property: the window-array algebra equals a direct Python
    simulation of the trailing Hampel filter on a pseudo-random
    series (deterministic seed)."""
    import random

    from v3io_tsdb_spark.operators.anomaly import trailing_hampel

    rng = random.Random(7)
    hour = 3_600_000
    counts = [rng.randint(1, 9) for _ in range(40)]
    rows = []
    for b, n in enumerate(counts):
        rows += [("a", b * hour + i) for i in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    got = {
        r["t"] // hour: r
        for r in trailing_hampel(df, lookback=24, min_history=12).collect()
    }

    def med(vals):
        v = sorted(vals)
        m = len(v)
        return (v[(m + 1) // 2 - 1] + v[m // 2]) / 2.0

    for b, n in enumerate(counts):
        win = counts[max(0, b - 24) : b]
        r = got[b]
        if len(win) < 12:
            assert r["med"] is None and r["is_anomaly"] is None
            continue
        m = med([float(x) for x in win])
        d = med([abs(x - m) for x in win])
        assert r["med"] == pytest.approx(m, abs=1e-9)
        assert r["mad"] == pytest.approx(d, abs=1e-9)
        dev = abs(n - m)
        assert r["is_anomaly"] == int(dev > 3.0 * (1.4826 * d))
        if d > 0:
            assert r["z"] == pytest.approx(dev / (1.4826 * d), abs=1e-3)
        else:
            assert r["z"] is None


def test_trailing_hampel_hides_nothing_from_itself(spark):
    """The trailing frame excludes the current bucket: an outlier is
    judged by CLEAN history (never dilutes its own yardstick), so the
    spike right after it still scores against mostly-clean stats."""
    from v3io_tsdb_spark.operators.anomaly import trailing_hampel

    hour = 3_600_000
    rows = []
    for b, n in enumerate([5] * 12 + [100]):
        rows += [("a", b * hour + i) for i in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    out = {r["t"] // hour: r for r in trailing_hampel(df, min_history=12).collect()}
    assert out[12]["med"] == 5.0 and out[12]["is_anomaly"] == 1


# ----------------------------------------------------------------- PQ


def _toy_vectors(spark, n=40, dim=16, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_pq_encode_is_row_local_and_anchor_exact(spark):
    """Every anchor encodes to its own codebook entry in every
    subspace (distance 0 is the unique minimum unless duplicated,
    ties to the lowest code); and encoding is row-local — encoding a
    subset equals the subset of the full encoding, which is what makes
    incremental maintenance trivial (encode only the new rows against
    frozen codebooks)."""
    from v3io_tsdb_spark.functions.similarity import pq_encode, pq_train

    df, rows = _toy_vectors(spark)
    cb = pq_train(df, m=4, ks=8)
    full = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb).collect()}
    for a in range(8):  # anchors are vec_ids 0..7
        assert full[a] == [a, a, a, a]
    sub = df.where("vec_id >= 20")
    part = {r["vec_id"]: r["codes"] for r in pq_encode(sub, cb).collect()}
    assert part == {k: v for k, v in full.items() if k >= 20}


def test_pq_topk_self_is_nearest_and_recall_reasonable(spark):
    """The query vector is anchor 0, so its own PQ distance is exactly
    0 and it ranks first; and on a small corpus the ADC ranking's
    top-10 must overlap the exact-L2 top-10 substantially (>= 50% —
    16 anchor cells over 40 vectors is a coarse quantizer; the
    committed recall gate measures the real fixture)."""
    from v3io_tsdb_spark.functions.similarity import pq_topk, sq_dist_col, query_vec_lit
    from pyspark.sql import functions as F2

    df, rows = _toy_vectors(spark)
    q = rows[0][1]
    got = pq_topk(df, q, k=10, m=4, ks=8).collect()
    assert got[0]["vec_id"] == 0 and got[0]["approx_dist"] == pytest.approx(0.0, abs=1e-9)
    v = F2.col("embedding").cast("array<double>")
    exact = [
        r["vec_id"]
        for r in df.select("vec_id", sq_dist_col(v, query_vec_lit(q)).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    overlap = len({r["vec_id"] for r in got} & set(exact))
    assert overlap >= 5


def test_pq_index_roundtrip(spark, tmp_path):
    """pq_write_index / read_pq_index: codes and codebooks survive the
    round trip and serve identical top-k."""
    from v3io_tsdb_spark.functions.similarity import (
        pq_topk,
        pq_write_index,
        read_pq_index,
    )

    df, rows = _toy_vectors(spark)
    path = str(tmp_path / "pq")
    cb = pq_write_index(df, path, m=4, ks=8)
    codes, cb2 = read_pq_index(spark, path)
    assert cb2 == cb
    direct = pq_topk(df, rows[0][1], k=5, m=4, ks=8).collect()
    served = pq_topk(df, rows[0][1], k=5, codebooks=cb2, codes=codes).collect()
    assert [(r["vec_id"], r["approx_dist"]) for r in direct] == [
        (r["vec_id"], r["approx_dist"]) for r in served
    ]


def test_pq_rerank_restores_exact_order_within_shortlist(spark):
    """With rerank=R the final ranking is EXACT L2 over the candidate
    set: if R covers the whole corpus the result equals the exact
    brute-force top-k precisely."""
    from v3io_tsdb_spark.functions.similarity import pq_topk, sq_dist_col, query_vec_lit
    from pyspark.sql import functions as F2

    df, rows = _toy_vectors(spark)
    q = rows[0][1]
    got = pq_topk(df, q, k=10, m=4, ks=8, rerank=40).collect()
    v = F2.col("embedding").cast("array<double>")
    exact = (
        df.select(
            "vec_id", F2.round(sq_dist_col(v, query_vec_lit(q)) + 1e-9, 6).alias("d")
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    assert [(r["vec_id"], r["dist"]) for r in got] == [
        (r["vec_id"], r["d"]) for r in exact
    ]


# ----------------------------------------------------- stream Hampel


def test_stream_trailing_hampel_cross_batch(tmp_path, spark):
    """Streaming Hampel: close-on-advance emission, ring state across
    micro-batches, and bit-exact agreement of med/MAD with the batch
    array algebra (integer counts -> exact rationals)."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_trailing_hampel

    H = 3_600_000
    in_dir = tmp_path / "h_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "h_ckpt")

    def write(fname, events):
        (in_dir / fname).write_text(
            "\n".join(json.dumps({"ts": t, "name": n, "value": 0.0})
                      for n, t in events)
        )

    # hours 0..3 with counts [2, 4, 2, 9]; lookback 3, min_history 2
    ev = []
    for h, n in enumerate([2, 4, 2, 9]):
        ev += [("a", h * H + i) for i in range(n)]
    write("b1.json", ev[:5])
    raw = spark.readStream.schema("ts long, name string, value double").json(str(in_dir))
    out = stream_trailing_hampel(raw, step_ms=H, lookback=3, min_history=2)
    q = (
        out.writeStream.format("memory").queryName("h_out")
        .outputMode("append").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        write("b2.json", ev[5:] + [("a", 4 * H)])  # hour 4 opens -> hour 3 closes
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["t"]: r for r in spark.sql("SELECT * FROM h_out").collect()}
    assert set(rows) == {0, H, 2 * H, 3 * H}
    assert rows[0]["med"] is None and rows[0]["is_anomaly"] is None
    assert rows[H]["med"] is None          # 1 trailing bucket < min_history
    r2 = rows[2 * H]                       # trailing [2,4] -> med 3, mad 1
    assert r2["med"] == 3.0 and r2["mad"] == 1.0
    assert r2["is_anomaly"] == 0
    r3 = rows[3 * H]                       # trailing [2,4,2] -> med 2, mad 0
    assert r3["med"] == 2.0 and r3["mad"] == 0.0
    assert r3["z"] is None and r3["is_anomaly"] == 1  # dev 7 > 0, strict flag


def test_stream_hampel_matches_batch_operator(tmp_path, spark):
    """The stream twin and the batch operator agree on every CLOSED
    bucket of a replayed fixture (the hash-gate property, asserted
    directly)."""
    import json
    import random

    from v3io_tsdb_spark.operators.anomaly import trailing_hampel
    from v3io_tsdb_spark.streaming.stateful import stream_trailing_hampel

    rng = random.Random(11)
    H = 3_600_000
    ev = []
    for h in range(30):
        for i in range(rng.randint(1, 6)):
            ev.append(("a" if h % 2 else "b", h * H + i * 7))
    in_dir = tmp_path / "hm_in"
    in_dir.mkdir()
    half = len(ev) // 2
    ev.sort(key=lambda e: e[1])
    for fname, chunk in (("b1.json", ev[:half]), ("b2.json", ev[half:])):
        (in_dir / fname).write_text(
            "\n".join(json.dumps({"ts": t, "name": n, "value": 0.0})
                      for n, t in chunk)
        )
    raw = spark.readStream.schema("ts long, name string, value double").json(str(in_dir))
    out = stream_trailing_hampel(raw, step_ms=H, lookback=5, min_history=3)
    q = (
        out.writeStream.format("memory").queryName("hm_out")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "hm_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["series_key"], r["t"]): (r["n"], r["med"], r["mad"], r["is_anomaly"])
        for r in spark.sql("SELECT * FROM hm_out").collect()
    }
    df = spark.createDataFrame(ev, "event_type string, ts_ms long")
    batch = trailing_hampel(df, step_ms=H, lookback=5, min_history=3)
    last_t = {r["event_type"]: r["mt"] for r in
              df.groupBy("event_type").agg(
                  (F.max(F.floor(F.col("ts_ms") / H) * H).cast("long")).alias("mt")
              ).collect()}
    want = {}
    for r in batch.collect():
        if r["t"] < last_t[r["event_type"]]:  # open buckets never emit
            want[(r["event_type"], r["t"])] = (
                r["n"], r["med"], r["mad"], r["is_anomaly"]
            )
    assert got == want


# ------------------------------------------------------ CMS heavy hitters


def test_cms_never_underestimates_and_gate_holds(spark):
    """The one-sided CMS guarantee: every estimate >= its exact count;
    the gate's collision bound holds on a skewed key set."""
    from v3io_tsdb_spark.functions.sketches import heavy_hitters_gate

    rows = [(f"u{i % 7}",) for i in range(400)] + [("whale",)] * 300
    df = spark.createDataFrame(rows, "user_id string")
    out = heavy_hitters_gate(df, "user_id", k=5).collect()
    assert len(out) == 5
    top = max(out, key=lambda r: r["exact"])
    assert top["key"] == "whale" and top["exact"] == 300
    for r in out:
        assert r["est"] >= r["exact"]
        assert r["ok"]


def test_cms_sketch_is_mergeable(spark):
    """sketch(A) + sketch(B) cell-wise == sketch(A union B) — the
    property that lets per-partition/day sketches combine without
    touching raw data again."""
    from v3io_tsdb_spark.functions.sketches import cms_sketch

    a = spark.createDataFrame([(f"k{i % 5}",) for i in range(50)], "user_id string")
    b = spark.createDataFrame([(f"k{i % 3}",) for i in range(30)], "user_id string")
    u = a.union(b)
    sa = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(a, "user_id").collect()}
    sb = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(b, "user_id").collect()}
    su = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(u, "user_id").collect()}
    merged = dict(sa)
    for cell, c in sb.items():
        merged[cell] = merged.get(cell, 0) + c
    assert merged == su
