"""Round-9 third wave: Theil-Sen robust trend, seasonal-naive forecast
evaluation (MASE), market-basket association rules, bigram-LM fluency
scoring, and feature-hashed linear classifier inference — goldens plus
the semantic property each operator exists to guarantee."""

import math

from pyspark.sql import functions as F

DAY = 86_400_000


# ------------------------------------------------------------ Theil-Sen


def _grid(spark, xs, name="m", uid="u", t0=0, step=DAY):
    rows = [(name, uid, t0 + i * step, float(x)) for i, x in enumerate(xs)]
    return spark.createDataFrame(
        rows, "name string, uid string, t long, x double"
    )


def test_theilsen_golden_outlier_resistant(spark):
    """xs = [1,2,3,4,100] on a daily grid: the 10 pairwise slopes sort
    to [1×6, 24.75, 32.67, 48, 96] → median slope 1.0 (OLS would fit
    ≈ +17.8/day). Intercept = median of x_i − 1·day_i = median of
    [1,1,1,1,96] = 1.0. The breakdown-point claim, verified by hand."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    out = theilsen_trend(_grid(spark, [1, 2, 3, 4, 100])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buckets"] == 5 and r["n_pairs"] == 10
    assert r["slope"] == 1.0
    assert r["intercept"] == 1.0


def test_theilsen_exact_line_recovered(spark):
    """A clean line x = 3.5·day − 2 is recovered exactly: every
    pairwise slope is 3.5, every residual intercept is −2."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    xs = [3.5 * i - 2 for i in range(8)]
    r = theilsen_trend(_grid(spark, xs)).collect()[0]
    assert r["slope"] == 3.5 and r["intercept"] == -2.0
    assert r["n_pairs"] == 28


def test_theilsen_single_bucket_null_verdict(spark):
    """One bucket → zero pairs → no trend verdict (NULL slope and
    intercept), but the series row itself is kept."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    r = theilsen_trend(_grid(spark, [7.0])).collect()[0]
    assert r["n_buckets"] == 1 and r["n_pairs"] == 0
    assert r["slope"] is None and r["intercept"] is None


def test_theilsen_shift_invariance(spark):
    """Adding a constant to every x leaves the slope untouched and
    shifts the intercept by exactly that constant — the affine
    property any trend fit must satisfy."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    xs = [2, 9, 4, 7, 1, 8, 5]
    a = theilsen_trend(_grid(spark, xs)).collect()[0]
    b = theilsen_trend(_grid(spark, [x + 100 for x in xs])).collect()[0]
    assert b["slope"] == a["slope"]
    assert abs(b["intercept"] - (a["intercept"] + 100)) < 1e-6


# ------------------------------------------------------- seasonal naive


def test_seasonal_naive_perfect_week_scores_zero(spark):
    """A series that repeats its weekly pattern exactly: the seasonal
    forecast is perfect (MAE 0, MASE 0) while the one-step naive MAE
    is positive — the 'beats the baseline' reading MASE exists for."""
    from v3io_tsdb_spark.operators.trend import seasonal_naive_eval

    xs = [1, 2, 3, 4, 5, 6, 7] * 2
    r = seasonal_naive_eval(_grid(spark, xs)).collect()[0]
    assert r["n_buckets"] == 14 and r["n_eval"] == 7
    assert r["mae_seasonal"] == 0.0
    assert r["mae_naive"] > 0
    assert r["mase"] == 0.0


def test_seasonal_naive_gap_safe_exact_match_frames(spark):
    """Missing buckets must NOT slip the lookup: with days
    [0, 7, 10, 14] present, day 7 and 14 find their week-ago value but
    day 10 finds neither a week-ago nor a day-ago bucket. A row-number
    lag(7) would have paired day 14 with the wrong bucket."""
    from v3io_tsdb_spark.operators.trend import seasonal_naive_eval

    rows = [("m", "u", d * DAY, float(v))
            for d, v in [(0, 10), (7, 12), (10, 99), (14, 12)]]
    df = spark.createDataFrame(
        rows, "name string, uid string, t long, x double"
    )
    r = seasonal_naive_eval(df).collect()[0]
    assert r["n_buckets"] == 4
    assert r["n_eval"] == 2          # only days 7 and 14 have t-7d
    assert r["mae_seasonal"] == 1.0  # (|12-10| + |12-12|) / 2
    assert r["mae_naive"] is None    # no bucket has a t-1d neighbour
    assert r["mase"] is None


def test_seasonal_naive_constant_series_has_no_scale(spark):
    """A constant series: seasonal MAE is 0 but the naive MAE is 0 too
    — MASE must be NULL (no scale), never a division blow-up."""
    from v3io_tsdb_spark.operators.trend import seasonal_naive_eval

    r = seasonal_naive_eval(_grid(spark, [5.0] * 10)).collect()[0]
    assert r["mae_seasonal"] == 0.0 and r["mae_naive"] == 0.0
    assert r["mase"] is None


# ----------------------------------------------------- association rules


def _baskets(spark, baskets):
    rows = [
        ("b%d" % i, item) for i, items in enumerate(baskets) for item in items
    ]
    return spark.createDataFrame(rows, "bid string, item string")


def test_assoc_rules_golden(spark):
    """Baskets {A,B},{A,B},{A,C},{B}: n=4, c_A=3, c_B=3, c_C=1.
    A→B: pair 2, support 1/2, confidence 2/3, lift (2/3)/(3/4)=8/9;
    A→C: pair 1, confidence 1/3, lift (1/3)/(1/4)=4/3 — all verified
    by hand."""
    from v3io_tsdb_spark.operators.assoc import basket_assoc_rules

    out = basket_assoc_rules(
        _baskets(spark, [["A", "B"], ["A", "B"], ["A", "C"], ["B"]]),
        ("bid",),
        "item",
    ).collect()
    rules = {(r["ante"], r["cons"]): r for r in out}
    assert set(rules) == {("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")}
    ab = rules[("A", "B")]
    assert ab["c_pair"] == 2 and ab["n_baskets"] == 4
    assert ab["support"] == 0.5
    assert abs(ab["confidence"] - 2 / 3) < 1e-12
    assert abs(ab["lift"] - 8 / 9) < 1e-12
    ac = rules[("A", "C")]
    assert abs(ac["confidence"] - 1 / 3) < 1e-12
    assert abs(ac["lift"] - 4 / 3) < 1e-12
    # symmetric stats: pair count and lift match across direction
    assert rules[("B", "A")]["c_pair"] == 2
    assert abs(rules[("B", "A")]["lift"] - ab["lift"]) < 1e-12


def test_assoc_rules_duplicates_in_basket_count_once(spark):
    """The market-basket contract: an item repeated within one basket
    contributes one membership, so supports reflect baskets, not
    event volume."""
    from v3io_tsdb_spark.operators.assoc import basket_assoc_rules

    out = basket_assoc_rules(
        _baskets(spark, [["A", "A", "A", "B"], ["A", "B", "B"]]),
        ("bid",),
        "item",
    ).collect()
    rules = {(r["ante"], r["cons"]): r for r in out}
    assert rules[("A", "B")]["c_pair"] == 2
    assert rules[("A", "B")]["c_ante"] == 2
    assert rules[("A", "B")]["support"] == 1.0
    assert rules[("A", "B")]["confidence"] == 1.0


def test_assoc_rules_independence_has_lift_one(spark):
    """Items that co-occur exactly as independence predicts get
    lift = 1: A in every basket, B in half → P(B|A) = P(B)."""
    from v3io_tsdb_spark.operators.assoc import basket_assoc_rules

    out = basket_assoc_rules(
        _baskets(spark, [["A", "B"], ["A", "B"], ["A"], ["A"]]),
        ("bid",),
        "item",
    ).collect()
    rules = {(r["ante"], r["cons"]): r for r in out}
    assert abs(rules[("A", "B")]["lift"] - 1.0) < 1e-12
    assert abs(rules[("B", "A")]["lift"] - 1.0) < 1e-12
    assert rules[("B", "A")]["confidence"] == 1.0


# -------------------------------------------------------- bigram logprob


def test_bigram_logprob_order_sensitivity(spark):
    """The property the operator exists for: two docs with IDENTICAL
    unigram histograms but different word order score differently —
    the doc whose transitions match the corpus's dominant bigram
    scores higher. (unigram_logprob provably cannot separate them.)"""
    from v3io_tsdb_spark.functions.text import bigram_logprob, unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # transitions dominated by 'a b'
            (2, "b a b a b a"),   # same unigrams, reversed transitions
            (3, "a b a b a b a b"),  # corpus weight behind 'a b'
            (4, "a b c a b"),
        ],
        "doc_id long, text string",
    )
    bg = {r["doc_id"]: r["mean_logprob"]
          for r in bigram_logprob(docs).collect()}
    assert bg[1] > bg[2]
    ug = {r["doc_id"]: r["mean_logprob"]
          for r in unigram_logprob(docs).collect()}
    assert abs(ug[1] - ug[2]) < 1e-12


def test_bigram_logprob_golden_tiny_corpus(spark):
    """Two-doc corpus, hand computation: bigrams 'x y'×2 and 'y x'×1,
    contexts c(x·)=2, c(y·)=1, V=2, α=0.5.
    doc 1 = 'x y': ln((2+.5)/(2+1)) = ln(5/6).
    doc 2 = 'x y x': mean of ln(5/6) and ln((1+.5)/(1+1)) = ln(3/4)."""
    from v3io_tsdb_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}

    def mn(p):
        # integer micro-nat quantization (text.micro_nats, VERDICT r11 #2)
        return float(round(math.log(p) * 1e6))

    assert got[1]["n_bigrams"] == 1
    assert abs(got[1]["mean_logprob"] - mn(2.5 / 3) / 1e6) < 1e-12
    want2 = (mn(2.5 / 3) + mn(1.5 / 2)) / (1e6 * 2)
    assert got[2]["n_bigrams"] == 2
    assert abs(got[2]["mean_logprob"] - want2) < 1e-12


def test_bigram_logprob_short_docs_drop(spark):
    """Docs with fewer than 2 tokens have no transitions and drop out
    — same contract as unigram_logprob's empty-doc rule."""
    from v3io_tsdb_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in bigram_logprob(docs).collect()}
    assert got == {3}


# ------------------------------------------------------ classifier score


def test_classifier_default_weights_deterministic(spark):
    """The stand-in model regenerates bit-for-bit: w(0) = −1 exactly,
    every weight in [−1, 1), and the table matches its own formula."""
    from v3io_tsdb_spark.functions.classifier import default_weight_table

    w = {r["bucket"]: r["weight"]
         for r in default_weight_table(spark, 256).collect()}
    assert len(w) == 256
    assert w[0] == -1.0
    for b, wt in w.items():
        assert wt == ((b * 2654435761) % 1999) / 999.5 - 1.0
        assert -1.0 <= wt < 1.0


def test_classifier_score_is_sigmoid_of_mean_weight(spark):
    """Score must equal σ(mean feature weight) under a KNOWN model: a
    custom weight table of all +2 gives margin 2 and score σ(2) for
    any doc with ≥1 feature."""
    from v3io_tsdb_spark.functions.classifier import classifier_score

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "q r")], "doc_id long, text string"
    )
    w = spark.range(4096).select(
        F.col("id").alias("bucket"), F.lit(2.0).alias("weight")
    )
    got = {r["doc_id"]: r for r in classifier_score(docs, weights=w).collect()}
    assert got[1]["n_features"] == 3 and got[2]["n_features"] == 1
    for r in got.values():
        assert r["margin"] == 2.0
        assert abs(r["score"] - 1 / (1 + math.exp(-2.0))) < 1e-9


def test_classifier_short_docs_have_no_features(spark):
    from v3io_tsdb_spark.functions.classifier import classifier_score

    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in classifier_score(docs).collect()}
    assert got == {3}


def test_classifier_feature_hash_stable_across_calls(spark):
    """Hashing is content-addressed: the same text scores identically
    in two independent runs (no RNG anywhere in the path)."""
    from v3io_tsdb_spark.functions.classifier import classifier_score

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps %d" % (i % 3)) for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted((r["doc_id"], r["score"])
               for r in classifier_score(docs).collect())
    b = sorted((r["doc_id"], r["score"])
               for r in classifier_score(docs).collect())
    assert a == b


# ------------------------------------------------------------- OLS trend


def test_ols_exact_line_recovered(spark):
    """x = 3.5·day − 2 with no noise: slope 3.5, intercept −2, R² = 1."""
    from v3io_tsdb_spark.operators.trend import ols_trend

    xs = [3.5 * i - 2 for i in range(8)]
    r = ols_trend(_grid(spark, xs)).collect()[0]
    assert abs(r["slope"] - 3.5) < 1e-9
    assert abs(r["intercept"] - (-2.0)) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-9


def test_ols_vs_theilsen_outlier_contrast(spark):
    """The reason both rows exist: one corrupted bucket moves the OLS
    slope far from truth while Theil-Sen holds — the slope GAP is the
    outlier alarm."""
    from v3io_tsdb_spark.operators.trend import ols_trend, theilsen_trend

    xs = [1, 2, 3, 4, 100]
    ols = ols_trend(_grid(spark, xs)).collect()[0]
    ts = theilsen_trend(_grid(spark, xs)).collect()[0]
    assert ts["slope"] == 1.0
    assert ols["slope"] > 10  # least squares dragged by the outlier


def test_ols_degenerate_verdicts(spark):
    """Single bucket → no slope (var_t = 0); constant series → slope 0
    with NULL R² (no explainable variance — not the SQL-standard 1.0)."""
    from v3io_tsdb_spark.operators.trend import ols_trend

    one = ols_trend(_grid(spark, [7.0])).collect()[0]
    assert one["slope"] is None and one["r2"] is None
    const = ols_trend(_grid(spark, [5.0] * 6)).collect()[0]
    assert const["slope"] == 0.0 and const["intercept"] == 5.0
    assert const["r2"] is None


# ----------------------------------------------------------- xcorr lagged


def test_xcorr_detects_known_lead(spark):
    """B is exactly A shifted two days later: corr at lag +2 is 1.0 and
    every other lag is strictly smaller — the lead is recovered."""
    from v3io_tsdb_spark.operators.trend import xcorr_lagged

    import random

    rng = random.Random(5)
    a = [rng.uniform(0, 10) for _ in range(30)]
    rows = [("A", i * DAY, a[i]) for i in range(30)]
    rows += [("B", (i + 2) * DAY, a[i]) for i in range(30)]
    df = spark.createDataFrame(rows, "name string, t long, x double")
    out = {r["lag"]: r for r in
           xcorr_lagged(df, "A", "B", max_lag=3).collect()}
    assert abs(out[2]["xcorr"] - 1.0) < 1e-6
    for lag, r in out.items():
        if lag != 2 and r["xcorr"] is not None:
            assert r["xcorr"] < 0.99


def test_xcorr_pair_counts_shrink_with_lag(spark):
    """Overlap bookkeeping: with both series on days 0..9, lag k pairs
    a_t with b_{t+k}, so n_pairs = 10 − |k|."""
    from v3io_tsdb_spark.operators.trend import xcorr_lagged

    rows = [(n, i * DAY, float(i * (2 if n == "B" else 1)))
            for n in ("A", "B") for i in range(10)]
    df = spark.createDataFrame(rows, "name string, t long, x double")
    out = {r["lag"]: r["n_pairs"] for r in
           xcorr_lagged(df, "A", "B", max_lag=3).collect()}
    assert out == {-3: 7, -2: 8, -1: 9, 0: 10, 1: 9, 2: 8, 3: 7}


# ------------------------------------------------------ histogram quantile


def test_histogram_quantile_golden_interpolation(spark):
    """Buckets [0,20):2, [20,40):6, [40,60):2 (N=10), hand-computed:
    q=0.5 → target 5 crosses the middle bucket → 20 + 20·(5−2)/6 = 30;
    q=0.9 → target 9 → 40 + 20·(9−8)/2 = 50; q=1.0 → exact max-edge 60."""
    from v3io_tsdb_spark.functions.histogram import histogram_quantile

    hist = spark.createDataFrame(
        [("g", 0.0, 2), ("g", 20.0, 6), ("g", 40.0, 2)],
        "grp string, bucket_lo double, n long",
    )
    out = {r["q"]: r["est"] for r in histogram_quantile(
        hist, (0.5, 0.9, 1.0), group_cols=("grp",), width=20.0
    ).collect()}
    assert out[0.5] == 30.0
    assert out[0.9] == 50.0
    assert out[1.0] == 60.0


def test_histogram_quantile_boundary_resolves_low_and_continuous(spark):
    """A target landing exactly on a bucket boundary (q=0.2 → target 2
    = the first bucket's cumulative count) resolves to the LOWER
    bucket and estimates its exact right edge — continuous with the
    next bucket's left edge, and selected by exactly one row."""
    from v3io_tsdb_spark.functions.histogram import histogram_quantile

    hist = spark.createDataFrame(
        [("g", 0.0, 2), ("g", 20.0, 6), ("g", 40.0, 2)],
        "grp string, bucket_lo double, n long",
    )
    rows = histogram_quantile(
        hist, (0.2,), group_cols=("grp",), width=20.0
    ).collect()
    assert len(rows) == 1
    assert rows[0]["est"] == 20.0


def test_histogram_quantile_matches_exact_on_uniform_buckets(spark):
    """Sanity against raw data: for values that are exactly bucket
    midpoints with one value per bucket, the q-th estimate lands
    inside the bucket holding the exact q-th value."""
    from v3io_tsdb_spark.functions.histogram import (
        fixed_width_histogram,
        histogram_quantile,
    )

    vals = [float(v) for v in range(100)]  # buckets of width 10: 10 each
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    hist = fixed_width_histogram(df, "value", 10).withColumn(
        "bucket_lo", F.col("bucket_lo").cast("double")
    )
    out = {r["q"]: r["est"] for r in histogram_quantile(
        hist, (0.5, 0.95), bucket_col="bucket_lo", width=10.0
    ).collect()}
    assert 40.0 <= out[0.5] <= 60.0
    assert 90.0 <= out[0.95] <= 100.0


# ----------------------------------------------------------------- RRF


def test_rrf_fuse_golden(spark):
    """sys0 = [a, b], sys1 = [b, c]: rrf(b) = 1/62 + 1/61 beats
    rrf(a) = 1/61 beats rrf(c) = 1/62; per-system rank columns carry
    NULL where a system didn't retrieve the id."""
    from v3io_tsdb_spark.functions.fusion import rrf_fuse

    s0 = spark.createDataFrame([("a", 1), ("b", 2)], "id string, rank long")
    s1 = spark.createDataFrame([("b", 1), ("c", 2)], "id string, rank long")
    out = rrf_fuse([s0, s1], "id", names=("lex", "vec"), k=10).collect()
    assert [r["id"] for r in out] == ["b", "a", "c"]
    assert [r["rank"] for r in out] == [1, 2, 3]
    b = out[0]
    assert abs(b["rrf"] - round(1 / 62 + 1 / 61 + 1e-9, 6)) < 1e-12
    assert b["rank_lex"] == 2 and b["rank_vec"] == 1
    a = out[1]
    assert a["rank_lex"] == 1 and a["rank_vec"] is None


def test_rrf_tie_breaks_on_id(spark):
    """Identical rrf scores order by id — the deterministic-tie rule
    every top-k in the repo shares."""
    from v3io_tsdb_spark.functions.fusion import rrf_fuse

    s0 = spark.createDataFrame([("z", 1), ("m", 2)], "id string, rank long")
    s1 = spark.createDataFrame([("m", 1), ("z", 2)], "id string, rank long")
    out = rrf_fuse([s0, s1], "id", k=10).collect()
    assert [r["id"] for r in out] == ["m", "z"]  # equal rrf → id asc
    assert out[0]["rrf"] == out[1]["rrf"]


# ----------------------------------------------------------- bloom semi


def test_bloom_no_false_negatives_and_prunes(spark):
    """The two Bloom guarantees, asserted directly: every build-side
    key passes the membership test (no false negatives — correctness),
    and a disjoint probe population is almost entirely pruned
    (effectiveness: at m=65536/k=4 with 50 keys, false-positive rate
    is ~0)."""
    from v3io_tsdb_spark.functions.bloom import (
        bloom_might_contain,
        build_bloom_bitmap,
    )

    small = spark.createDataFrame(
        [("u%d" % i,) for i in range(0, 100, 2)], "user_id string"
    )
    bm = build_bloom_bitmap(small, "user_id")
    assert len(bm) == 65536 // 64
    members = small.withColumn(
        "ok", bloom_might_contain(F.col("user_id"), bm)
    ).collect()
    assert all(r["ok"] for r in members)
    non = spark.createDataFrame(
        [("x%d" % i,) for i in range(1000)], "user_id string"
    )
    passed = non.where(bloom_might_contain(F.col("user_id"), bm)).count()
    assert passed < 20


def test_bloom_semi_join_is_exact(spark):
    """False positives never reach the output: the bloom-prefiltered
    semi-join returns exactly the plain semi-join's rows."""
    from v3io_tsdb_spark.functions.bloom import bloom_semi_join

    small = spark.createDataFrame(
        [("u%d" % i,) for i in range(0, 100, 3)], "user_id string"
    )
    big = spark.createDataFrame(
        [("u%d" % (i % 150), i) for i in range(3000)],
        "user_id string, v long",
    )
    got = sorted(
        (r["user_id"], r["v"])
        for r in bloom_semi_join(big, small, "user_id").collect()
    )
    want = sorted(
        (r["user_id"], r["v"])
        for r in big.join(small.distinct(), "user_id", "left_semi").collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------- heatmap mergeability


def test_value_heatmap_is_mergeable(spark):
    """heatmap(A) + heatmap(B) cell-wise == heatmap(A ∪ B): the
    property that lets per-day/partition histograms fold into a
    persisted rollup without re-reading raw data — and the reason the
    streaming twin of any histogram is just the same aggregate in
    complete mode."""
    from v3io_tsdb_spark.functions.histogram import value_heatmap

    def rows(seed, n):
        import random

        rng = random.Random(seed)
        return [
            ("t%d" % rng.randint(0, 2), rng.randint(0, 30) * 3_600_000,
             rng.uniform(-30, 90))
            for _ in range(n)
        ]

    schema = "event_type string, ts_ms long, value double"
    a = spark.createDataFrame(rows(1, 300), schema)
    b = spark.createDataFrame(rows(2, 200), schema)

    def cells(df):
        return {
            (r["event_type"], r["t"], r["bucket_lo"]): r["n"]
            for r in value_heatmap(
                df, "value", 20.0, group_cols=("event_type",)
            ).collect()
        }

    ca, cb, cu = cells(a), cells(b), cells(a.union(b))
    merged = dict(ca)
    for cell, n in cb.items():
        merged[cell] = merged.get(cell, 0) + n
    assert merged == cu


# ------------------------------------------------------- streaming CMS


def test_stream_cms_folds_across_micro_batches(tmp_path, spark):
    """The mergeable-sketch property inside the streaming engine: two
    micro-batches' partial cells fold into state so the final
    complete-mode table equals the batch sketch of the union."""
    import json

    from v3io_tsdb_spark.functions.sketches import cms_sketch

    in_dir = tmp_path / "cms_in"
    in_dir.mkdir()
    ev1 = [{"ts": i, "name": "k%d" % (i % 5), "value": 0.0} for i in range(60)]
    ev2 = [{"ts": i, "name": "k%d" % (i % 3), "value": 0.0} for i in range(40)]
    (in_dir / "b1.json").write_text("\n".join(json.dumps(e) for e in ev1))
    raw = spark.readStream.schema("ts long, name string, value double").json(
        str(in_dir)
    )
    q = (
        cms_sketch(raw, "name")
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cms_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        (in_dir / "b2.json").write_text("\n".join(json.dumps(e) for e in ev2))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["r"], r["b"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_out").collect()
    }
    both = spark.createDataFrame(
        [(e["name"],) for e in ev1 + ev2], "name string"
    )
    want = {
        (r["r"], r["b"]): r["cnt"] for r in cms_sketch(both, "name").collect()
    }
    assert got == want


# --------------------------------------------------------------- z-order


def test_zvalue_golden_interleave(spark):
    """Morton bit-interleave against a literal python reference."""
    from v3io_tsdb_spark.functions.layout import zvalue_col

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    cases = [(0, 0), (1, 0), (0, 1), (3, 3), (2, 3), (13, 7), (255, 1)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select(
        "a", "b", zvalue_col(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_prunes_secondary_dimension(spark, tmp_path):
    """The pruning claim, measured from parquet FOOTERS, not asserted
    from theory: 30 days x 128 users written as 16 files. Under the
    time-sorted layout (the reference's ingest order) a query for ONE
    user across all time intersects every file's (user) min/max range;
    under z-order it intersects a small fraction. Day-selective
    queries stay well-pruned under z-order (the documented trade)."""
    import pyarrow.parquet as pq

    from v3io_tsdb_spark.functions.layout import zorder_repartition

    rows = [(d, u, d * 1000 + u) for d in range(30) for u in range(128)]
    df = spark.createDataFrame(rows, "d long, u long, v long")

    def file_ranges(path):
        out = []
        import os as _os

        for fn in _os.listdir(path):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(_os.path.join(path, fn)).metadata
            lo_d = hi_d = lo_u = hi_u = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if name == "d":
                        lo_d = st.min if lo_d is None else min(lo_d, st.min)
                        hi_d = st.max if hi_d is None else max(hi_d, st.max)
                    if name == "u":
                        lo_u = st.min if lo_u is None else min(lo_u, st.min)
                        hi_u = st.max if hi_u is None else max(hi_u, st.max)
            out.append((lo_d, hi_d, lo_u, hi_u))
        return out

    lin = str(tmp_path / "linear")
    df.repartitionByRange(16, "d").sortWithinPartitions("d", "u").write.parquet(lin)
    zo = str(tmp_path / "zorder")
    zorder_repartition(df, "d", "u", 16).write.parquet(zo)

    lin_r, zo_r = file_ranges(lin), file_ranges(zo)
    assert len(lin_r) == 16 and len(zo_r) == 16

    def touched(ranges, d=None, u=None):
        n = 0
        for lo_d, hi_d, lo_u, hi_u in ranges:
            if d is not None and not (lo_d <= d <= hi_d):
                continue
            if u is not None and not (lo_u <= u <= hi_u):
                continue
            n += 1
        return n

    # one user, all days: the z-order payoff dimension
    lin_u = touched(lin_r, u=77)
    zo_u = touched(zo_r, u=77)
    assert lin_u == 16          # time-sorted layout cannot prune users
    assert zo_u <= 8, zo_r      # z-order: at most half, typically ~1/4
    # one day, all users: the trade — z-order stays well-pruned
    zo_d = touched(zo_r, d=11)
    assert zo_d <= 8, zo_r


def test_histogram_quantile_within_one_bucket_of_exact(spark):
    """PromQL's accuracy contract, property-tested: for ANY data, the
    reconstructed q-quantile lies within one bucket width of the exact
    q-th value, because the crossing bucket must contain the exact
    order statistic."""
    import random

    from v3io_tsdb_spark.functions.histogram import (
        fixed_width_histogram,
        histogram_quantile,
    )

    rng = random.Random(42)
    for trial in range(3):
        vals = [rng.uniform(-50, 250) for _ in range(rng.randint(20, 400))]
        df = spark.createDataFrame([(v,) for v in vals], "value double")
        hist = fixed_width_histogram(df, "value", 25).withColumn(
            "bucket_lo", F.col("bucket_lo").cast("double")
        )
        out = {r["q"]: r["est"] for r in histogram_quantile(
            hist, (0.25, 0.5, 0.95), bucket_col="bucket_lo", width=25.0
        ).collect()}
        srt = sorted(vals)
        for q, est in out.items():
            # exact order statistic at ceil(q*n) (the crossing rank)
            import math as _m

            exact = srt[max(0, _m.ceil(q * len(srt)) - 1)]
            assert abs(est - exact) <= 25.0 + 1e-9, (trial, q, est, exact)


# ------------------------------------------------------- HLL rollup gate


def test_hll_rollup_merges_instead_of_adding(spark):
    """The reason mergeable sketches exist: the SAME 50 users active
    every day means summed daily distincts (700) wildly overcount the
    weekly distinct (50). The merged weekly sketch must track 50 —
    union semantics, not addition — and pass the 5% gate."""
    from v3io_tsdb_spark.functions.sketches import hll_rollup_gate

    DAY = 86_400_000
    rows = [
        (d * DAY + i, "u%d" % (i % 50))
        for d in range(14)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts long, user_id string")
    out = {r["t"]: r for r in hll_rollup_gate(
        df, "user_id", "ts", fine_ms=DAY, coarse_ms=7 * DAY
    ).collect()}
    assert len(out) == 2
    for r in out.values():
        assert r["n_fine_buckets"] == 7
        assert r["n_exact"] == 50
        assert r["ok"]


def test_hll_rollup_disjoint_days_still_exact_union(spark):
    """Disjoint daily populations: weekly exact = sum of dailies, and
    the union estimate must land within tolerance there too (both
    extremes of overlap bracketed)."""
    from v3io_tsdb_spark.functions.sketches import hll_rollup_gate

    DAY = 86_400_000
    rows = [
        (d * DAY + i, "d%d_u%d" % (d, i)) for d in range(7) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "ts long, user_id string")
    r = hll_rollup_gate(
        df, "user_id", "ts", fine_ms=DAY, coarse_ms=7 * DAY
    ).collect()[0]
    assert r["n_exact"] == 280 and r["ok"]


# ------------------------------------------------------- weighted sample


def test_weighted_sample_matches_python_reference(spark):
    """Hash-deterministic priorities reproduce exactly in pure python
    (the no-RNG contract): same u derivation, same log-priority, same
    top-k with id tiebreak."""
    import hashlib

    from v3io_tsdb_spark.functions.sampling import weighted_sample_topk

    rows = [(i, (i * 37) % 900 + 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        (r["rank"], r["doc_id"])
        for r in weighted_sample_topk(df, "n_chars", k=15).collect()
    ]

    def prio(i, w):
        h = int(hashlib.md5(("%d_ws" % i).encode()).hexdigest()[:15], 16)
        import math as _m

        return round(_m.log((h + 1) / float((1 << 60) + 1)) / w + 1e-12, 9)

    ranked = sorted(rows, key=lambda t: (-prio(*t), t[0]))[:15]
    assert got == [(n + 1, i) for n, (i, _) in enumerate(ranked)]


def test_weighted_sample_zero_weight_excluded_and_weight_matters(spark):
    """Zero-weight items carry no sampling mass; a much larger weight
    strictly increases priority for the same id-hash (u^(1/w) -> 1 as
    w grows, so giant-weight items dominate the sample)."""
    from v3io_tsdb_spark.functions.sampling import weighted_sample_topk

    rows = [(i, 10) for i in range(50)] + [(100, 0), (101, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = weighted_sample_topk(df, "n_chars", k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 100 not in ids            # zero weight: excluded
    assert out[0]["doc_id"] == 101   # overwhelming weight: rank 1
