"""Round-10 wave 2 goldens: drawdown, predict_linear, topk/bottomk,
Markov transitions + k-step power iteration, blocked fuzzy dedup,
vocabulary growth / Heaps fit."""

import math

import pytest
from pyspark.sql import functions as F

DAY = 86_400_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ drawdown


def test_drawdown_golden(spark):
    """Values 10, 8, 12, 6: peak walks 10,10,12,12; dd = 0, .2, 0, .5;
    max_dd = 0, .2, .2, .5."""
    from v3io_tsdb_spark.operators.trend import drawdown

    rows = [("m", "u", d * DAY, v) for d, v in enumerate([10.0, 8.0, 12.0, 6.0])]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(drawdown(df, step_ms=DAY, from_ms=0).collect(),
                 key=lambda r: r["t"])
    assert [r["peak"] for r in out] == [10.0, 10.0, 12.0, 12.0]
    assert [r["dd"] for r in out] == [0.0, 0.2, 0.0, 0.5]
    assert [r["max_dd"] for r in out] == [0.0, 0.2, 0.2, 0.5]


def test_drawdown_nonpositive_peak_null(spark):
    """A running peak <= 0 has no 'fraction of peak' reading: dd null,
    and max_dd skips the undefined buckets."""
    from v3io_tsdb_spark.operators.trend import drawdown

    rows = [("m", "u", d * DAY, v) for d, v in enumerate([-5.0, -8.0, 4.0, 2.0])]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(drawdown(df, step_ms=DAY, from_ms=0).collect(),
                 key=lambda r: r["t"])
    assert out[0]["dd"] is None and out[1]["dd"] is None
    assert out[2]["dd"] == 0.0 and out[3]["dd"] == 0.5
    assert out[1]["max_dd"] is None and out[3]["max_dd"] == 0.5


# ------------------------------------------------------ predict_linear


def test_predict_linear_exact_line(spark):
    """On x = 5 + 2i the rolling fit is exact: slope 2, predict at
    i+3 equals 5 + 2(i+3). First 6 buckets have no full window."""
    from v3io_tsdb_spark.operators.trend import predict_linear

    rows = [("m", "u", d * DAY, 5.0 + 2.0 * d) for d in range(10)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(predict_linear(df, step_ms=DAY, from_ms=0, lookback=7,
                                horizon=3).collect(), key=lambda r: r["t"])
    for r in out[:6]:
        assert r["slope"] is None and r["predict"] is None
    for r in out[6:]:
        d = r["t"] // DAY
        assert r["slope"] == 2.0
        assert r["predict"] == 5.0 + 2.0 * (d + 3)


def test_predict_linear_gap_nulls_window(spark):
    """RANGE frame: a missing bucket inside the trailing week shrinks
    the count below lookback and nulls the verdict — no silent slide."""
    from v3io_tsdb_spark.operators.trend import predict_linear

    rows = [("m", "u", d * DAY, float(d)) for d in range(14) if d != 8]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {r["t"] // DAY: r for r in predict_linear(
        df, step_ms=DAY, from_ms=0, lookback=7, horizon=1).collect()}
    # days 8+7-1=14 > 13, so windows containing the hole (days 8..14)
    # are null; day 6 and 7 are full (0-6, 1-7)
    assert out[6]["slope"] == 1.0 and out[7]["slope"] == 1.0
    for d in (9, 10, 11, 12, 13):
        assert out[d]["slope"] is None


# ------------------------------------------------------------- topk


def test_topk_rank_and_tiebreak(spark):
    """Per-bucket rank by value desc; equal values order by series
    key so both engines agree."""
    from v3io_tsdb_spark.operators.frames import topk_series_per_bucket

    rows = [
        ("a", "1", 0, 5.0), ("b", "1", 0, 7.0), ("c", "1", 0, 5.0),
        ("d", "1", 0, 1.0),
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(topk_series_per_bucket(df, step_ms=DAY, from_ms=0, k=3)
                 .collect(), key=lambda r: r["rank"])
    assert [(r["rank"], r["name"]) for r in out] == [(1, "b"), (2, "a"), (3, "c")]


def test_bottomk(spark):
    from v3io_tsdb_spark.operators.frames import topk_series_per_bucket

    rows = [("a", "1", 0, 5.0), ("b", "1", 0, 7.0), ("c", "1", 0, 1.0)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = sorted(topk_series_per_bucket(df, step_ms=DAY, from_ms=0, k=2,
                                        bottom=True).collect(),
                 key=lambda r: r["rank"])
    assert [(r["rank"], r["name"]) for r in out] == [(1, "c"), (2, "a")]


def test_topk_no_global_sort(spark):
    """The rank window partitions by bucket — the plan must not
    contain a global (empty-partition-spec) sort over the grid."""
    from v3io_tsdb_spark.operators.frames import topk_series_per_bucket

    rows = [("a", "1", d * DAY, float(d)) for d in range(3)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    plan = _plan(topk_series_per_bucket(df, step_ms=DAY, from_ms=0, k=2))
    assert "windowspecdefinition(t" in plan.replace(" ", "").lower() or \
           "partitionBy" not in plan  # window partitions by t, not global


# ------------------------------------------------------------- markov


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )


def test_markov_transitions_golden(spark):
    """u1 walks A>B>A>C in one session: pairs A>B, B>A, A>C →
    p(B|A)=p(C|A)=0.5, p(A|B)=1.0."""
    from v3io_tsdb_spark.operators.paths import markov_transitions

    ev = _mk_events(spark, [
        (1, 1000, "A", 1), (1, 2000, "B", 2), (1, 3000, "A", 3),
        (1, 4000, "C", 4),
    ])
    out = {(r["from_state"], r["to_state"]): r for r in
           markov_transitions(ev).collect()}
    assert out[("A", "B")]["c"] == 1 and out[("A", "B")]["p"] == 0.5
    assert out[("A", "C")]["p"] == 0.5
    assert out[("B", "A")]["p"] == 1.0
    assert ("C", "A") not in out  # session ends at C


def test_markov_transitions_session_gap_breaks_pair(spark):
    """A 31-minute silence splits the session: no transition across
    the gap."""
    from v3io_tsdb_spark.operators.paths import markov_transitions

    ev = _mk_events(spark, [
        (1, 0, "A", 1), (1, 31 * 60 * 1000, "B", 2),
    ])
    assert markov_transitions(ev).count() == 0


def test_markov_kstep_absorbing_mass_exits(spark):
    """Chain A→B (p=1), B has no outgoing edges: from uniform
    (A=.5, B=.5), step 1 moves A's mass to B and B's mass exits —
    total_mass 0.5; step 2 exits everything."""
    from v3io_tsdb_spark.operators.paths import markov_kstep, markov_transitions

    ev = _mk_events(spark, [(1, 1000, "A", 1), (1, 2000, "B", 2)])
    trans = markov_transitions(ev)
    s1 = markov_kstep(trans, k=1).collect()
    assert len(s1) == 1 and s1[0]["state"] == "B"
    assert s1[0]["p"] == 0.5 and s1[0]["total_mass"] == 0.5
    assert markov_kstep(trans, k=2).count() == 0


def test_markov_kstep_stationary_fixed_point(spark):
    """A↔B symmetric chain: uniform is stationary — the distribution
    is (.5, .5) after any k and total_mass stays 1.0."""
    from v3io_tsdb_spark.operators.paths import markov_kstep, markov_transitions

    ev = _mk_events(spark, [
        (1, 1000, "A", 1), (1, 2000, "B", 2), (1, 3000, "A", 3),
        (1, 4000, "B", 4), (1, 5000, "A", 5),
    ])
    trans = markov_transitions(ev)
    out = {r["state"]: r for r in markov_kstep(trans, k=3).collect()}
    assert out["A"]["p"] == 0.5 and out["B"]["p"] == 0.5
    assert out["A"]["total_mass"] == 1.0


# ------------------------------------------------------- fuzzy dedup


def test_fuzzy_pairs_finds_small_edit(spark):
    """Two docs differing by one in-place word land in the same
    (prefix, band) block and pair with their true edit distance."""
    from v3io_tsdb_spark.functions.dedup import fuzzy_pairs_blocked

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown cat jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "совершенно другой текст без общего префикса")],
        "doc_id long, text string",
    )
    out = fuzzy_pairs_blocked(docs).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["dist"] == 3  # fox -> cat
    # order-sensitivity: the same words shuffled do NOT pair


def test_fuzzy_pairs_drops_oversized_block(spark):
    """A boilerplate prefix shared by > max_block docs is dropped
    whole — the df-cap rule."""
    from v3io_tsdb_spark.functions.dedup import fuzzy_pairs_blocked

    docs = spark.createDataFrame(
        [(i, "boilerplate header text " + ("x" * (i % 3))) for i in range(10)],
        "doc_id long, text string",
    )
    assert fuzzy_pairs_blocked(docs, max_block=3).count() == 0
    assert fuzzy_pairs_blocked(docs, max_block=20).count() > 0


def test_fuzzy_pairs_band_straddle_missed_is_contract(spark):
    """Docs in different length bands never pair (documented blocking
    recall hole)."""
    from v3io_tsdb_spark.functions.dedup import fuzzy_pairs_blocked

    a = "common prefix words " + "a " * 30   # ~80 chars
    b = "common prefix words " + "a " * 80   # ~180 chars, other band
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    assert fuzzy_pairs_blocked(docs, max_dist=80).count() == 0


# ------------------------------------------------------ vocab growth


def test_vocab_growth_monotone_and_exact_tail(spark):
    """Hand corpus: vocabulary is nondecreasing across checkpoints,
    the final row sees the whole corpus, and first-occurrence
    bucketing matches a literal prefix count."""
    from v3io_tsdb_spark.functions.text import vocab_growth

    docs = spark.createDataFrame(
        [(0, "a b c"), (3, "a b d"), (5, "e f"), (9, "a g h i")],
        "doc_id long, text string",
    )
    out = sorted(vocab_growth(docs).collect(), key=lambda r: r["cp"])
    assert len(out) == 10
    vs = [r["vocab"] for r in out]
    assert vs == sorted(vs)
    last = out[-1]
    assert last["n_docs"] == 4 and last["n_tokens"] == 12
    assert last["vocab"] == 9  # a b c d e f g h i
    # doc 3 lands in interval ceil(10*3/9) = 4: vocab through cp 4 is
    # {a,b,c,d}, tokens 6
    cp4 = out[3]
    assert cp4["n_docs"] == 2 and cp4["n_tokens"] == 6 and cp4["vocab"] == 4


def test_vocab_growth_single_pass_no_distinct_rescan(spark):
    """The plan aggregates term first-occurrences once — there must be
    exactly one scan-side explode (generate), not one per checkpoint."""
    from v3io_tsdb_spark.functions.text import vocab_growth

    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan(vocab_growth(docs))
    assert plan.count("Generate explode") <= 1
