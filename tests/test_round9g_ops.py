"""Round-9 seventh wave: source-overlap matrix, OOV rate, min/max
decimation, last-touch attribution — goldens plus plan audits."""

import math

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------- source overlap


def test_source_overlap_mirror_detected(spark):
    """Sources A and B carry the same long text → identical winnow
    fingerprint sets → overlap 1.0; source C shares nothing → no
    (A,C)/(B,C) row (zero-overlap pairs are absent, not zero-filled —
    the matrix is sparse by construction)."""
    from v3io_tsdb_spark.functions.dedup import source_overlap_matrix

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, text, "A"), (2, text, "B"),
         (3, "one two three four five six seven eight nine ten", "C")],
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in
           source_overlap_matrix(docs).collect()}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert r["shared_fps"] == r["n_fp_a"] == r["n_fp_b"]
    assert r["overlap"] == 1.0


def test_source_overlap_no_cartesian(spark):
    """The pair join is fp-keyed over the distinct (source, fp)
    reduction — never a cross product of anything doc-sized."""
    from v3io_tsdb_spark.functions.dedup import source_overlap_matrix

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h", "A"), (2, "a b c d e f g h", "B")],
        "doc_id long, text string, source string",
    )
    plan = _plan(source_overlap_matrix(docs))
    assert "CartesianProduct" not in plan, plan[:1200]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1200]


# ------------------------------------------------------- OOV rate


def test_oov_rate_golden_and_tiebreak(spark):
    """Corpus: three 'a a a b' docs + one 'z q'. top_v=2 → vocab
    {a, b}: the z/q doc is 100% OOV, the others 0%. top_v=3 → the
    count-1 tie between 'q' and 'z' resolves token-asc to 'q': the
    z/q doc drops to 50% — the boundary tie-break is the contract."""
    from v3io_tsdb_spark.functions.text import oov_rate

    docs = spark.createDataFrame(
        [(i, "a a a b") for i in range(3)] + [(9, "z q")],
        "doc_id long, text string",
    )
    r2 = {r["doc_id"]: r for r in oov_rate(docs, top_v=2).collect()}
    assert r2[9]["oov_rate"] == 1.0 and r2[9]["n_oov"] == 2
    assert r2[0]["oov_rate"] == 0.0
    r3 = {r["doc_id"]: r for r in oov_rate(docs, top_v=3).collect()}
    assert r3[9]["n_oov"] == 1 and r3[9]["oov_rate"] == 0.5


def test_oov_vocab_broadcasts_docs_never_shuffle_for_join(spark):
    """The V-row vocab joins as a broadcast hash join; the vocab cut
    is TakeOrdered, not a global sort."""
    from v3io_tsdb_spark.functions.text import oov_rate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(oov_rate(docs, top_v=2))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan
    assert "TakeOrdered" in plan, plan[:1500]


# ------------------------------------------------ minmax decimate


def test_minmax_decimate_golden(spark):
    """Samples (10,5),(20,1),(30,9),(40,1) in one bucket → min 1 at
    ts 20 (earliest of the tied minima), max 9 at ts 30, count 4. A
    separate max tie (7@10, 7@20) resolves to the earlier ts."""
    from v3io_tsdb_spark.operators.interpolate import minmax_decimate

    rows = [("m", "u", 10, 5.0), ("m", "u", 20, 1.0),
            ("m", "u", 30, 9.0), ("m", "u", 40, 1.0),
            ("m", "v", 10, 7.0), ("m", "v", 20, 7.0)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {r["uid"]: r for r in
           minmax_decimate(df, ts_col="t", step_ms=100, from_ms=0).collect()}
    u = out["u"]
    assert (u["count"], u["min_v"], u["min_ts"]) == (4, 1.0, 20)
    assert (u["max_v"], u["max_ts"]) == (9.0, 30)
    v = out["v"]
    assert (v["min_ts"], v["max_ts"]) == (10, 10)


def test_minmax_decimate_single_exchange(spark):
    """One partial-aggregable (series, bucket) shuffle; min_by/max_by
    fold map-side — no window, no join."""
    from v3io_tsdb_spark.operators.interpolate import minmax_decimate

    df = spark.createDataFrame(
        [("m", "u", 10, 5.0)], "name string, uid string, t long, value double"
    )
    plan = _plan(minmax_decimate(df, ts_col="t", step_ms=100))
    assert "Join" not in plan and "Window" not in plan, plan[:800]
    assert plan.count("Exchange") == 1, plan[:1200]


# ------------------------------------------------- attribution


def test_attribution_golden(spark):
    """u1 view→click→purchase credits click (LAST touch); u2's bare
    purchase credits (none); u3's touch is outside the window →
    (none); u4's two purchases BOTH credit the view — an intermediate
    purchase never attributes a later one."""
    from v3io_tsdb_spark.operators.funnel import attribution_report

    rows = [(1, 0, "view", 0), (1, 100, "click", 1), (1, 200, "purchase", 2),
            (2, 0, "purchase", 3),
            (3, 0, "click", 4), (3, 5_000_000, "purchase", 5),
            (4, 10, "view", 6), (4, 50, "purchase", 7), (4, 100, "purchase", 8)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )
    out = {r["touch_type"]: r["conversions"] for r in
           attribution_report(df, "purchase", window_ms=1000).collect()}
    assert out == {"click": 1, "(none)": 2, "view": 2}
    assert sum(out.values()) == 5  # every conversion is accounted for


def test_attribution_one_user_exchange_no_join(spark):
    """The as-of lookup is a running last(ignorenulls) over the user
    window — no self-join; user exchange + the bounded report
    aggregate only."""
    from v3io_tsdb_spark.operators.funnel import attribution_report

    df = spark.createDataFrame(
        [(1, 0, "view", 0), (1, 5, "purchase", 1)],
        "user_id long, ts_ms long, event_type string, event_id long",
    )
    plan = _plan(attribution_report(df, "purchase", window_ms=1000))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") == 2, plan[:1200]


# ------------------------------------------------ bollinger bands


def test_bollinger_golden_breach_detection(spark):
    """Seven flat buckets (value 10, σ=0) then an 8th at 10.5: band is
    [10, 10] exactly, the spike breaches +1 — and because the window
    EXCLUDES the current bucket, the spike cannot widen the band that
    judges it. The first 7 buckets carry null bands (no full
    lookback)."""
    from v3io_tsdb_spark.operators.trend import bollinger_bands

    DAY = 86_400_000
    rows = [("m", "u", i * DAY, 10.0) for i in range(7)] + [
        ("m", "u", 7 * DAY, 10.5)
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {r["t"] // DAY: r for r in
           bollinger_bands(df, ts_col="t", step_ms=DAY, from_ms=0).collect()}
    for i in range(7):
        assert out[i]["mid"] is None and out[i]["breach"] is None
    r = out[7]
    assert r["mid"] == 10.0 and r["upper"] == 10.0 and r["lower"] == 10.0
    assert r["breach"] == 1


def test_bollinger_gap_safe_range_window(spark):
    """Dropping bucket 3 nulls the band for every bucket whose trailing
    7-window should contain it: only buckets ≥ 11 (window [4..10]+)
    regain a verdict — a ROWS frame would have slid bucket 0 in and
    produced a wrong band silently."""
    from v3io_tsdb_spark.operators.trend import bollinger_bands

    DAY = 86_400_000
    rows = [("m", "u", i * DAY, float(i)) for i in range(14) if i != 3]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = bollinger_bands(df, ts_col="t", step_ms=DAY, from_ms=0).collect()
    with_band = sorted(r["t"] // DAY for r in out if r["mid"] is not None)
    assert with_band == [11, 12, 13]
