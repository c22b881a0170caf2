"""Round-9 fifth wave: readability scoring, hard-negative mining, and
key-skew profiling — goldens plus plan audits."""

import math

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- readability


def test_readability_golden_hand_counts(spark):
    """'The cat sat. The dog ran!' → 6 words, 2 sentence runs, 6
    syllables (every word one vowel group): wps=3, spw=1 →
    flesch = 206.835 − 3.045 − 84.6 = 119.19,
    fk = 1.17 + 11.8 − 15.59 = −2.62."""
    from v3io_tsdb_spark.functions.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id long, text string"
    )
    r = readability_scores(docs).collect()[0]
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    assert math.isclose(r["flesch"], 119.19, abs_tol=1e-9)
    assert math.isclose(r["fk_grade"], -2.62, abs_tol=1e-9)


def test_readability_syllable_floor_and_no_verdict(spark):
    """'rhythm' counts 1 syllable via its y-group; a vowel-less token
    ('bcdf') floors at 1; a doc with no alphabetic words (digits only)
    is dropped — no verdict, not a fabricated score."""
    from v3io_tsdb_spark.functions.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "rhythm bcdf"), (2, "123 456 !!")], "doc_id long, text string"
    )
    out = readability_scores(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_syllables"] == 2


def test_readability_is_zero_shuffle(spark):
    """Pure scan-side column algebra: no exchange, no UDF node."""
    from v3io_tsdb_spark.functions.text import readability_scores

    docs = spark.createDataFrame([(1, "a b.")], "doc_id long, text string")
    plan = _plan(readability_scores(docs))
    assert "Exchange" not in plan, plan[:800]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------- hard negatives


def test_hard_negatives_band_excludes_dups_and_noise(spark):
    """Query [1,0] against: a near-dup (cos≈0.995 ≥ hi — what near-dup
    dedup removes must never surface as a negative), an orthogonal
    vector (cos 0 < lo), and two 45° vectors (cos≈0.7071, in band).
    Only the two in-band vectors return, ranked with id tiebreak."""
    from v3io_tsdb_spark.functions.similarity import hard_negatives

    base = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 1.0]), (4, [2.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = hard_negatives(base, qs, lo=0.3, hi=0.95, k=5).collect()
    got = [(r["vec_id"], r["rank"]) for r in out]
    assert got == [(3, 1), (4, 2)]
    assert all(0.3 <= r["cosine"] < 0.95 for r in out)


def test_hard_negatives_filters_before_rank_window(spark):
    """The band filter must sit BELOW the rank window in the physical
    plan (executes first), so the per-query sort state is band-sized,
    not N. Queries broadcast; no shuffle join of the vector table."""
    from v3io_tsdb_spark.functions.similarity import hard_negatives

    base = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    qs = spark.createDataFrame(
        [(9, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    plan = _plan(hard_negatives(base, qs, lo=0.2, hi=0.8, k=5))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan
    # top-down text: Window node prints above (executes after) the
    # band Filter containing the lo literal
    assert plan.index("Window") < plan.index("0.2"), plan[:1500]


# ------------------------------------------------------ key skew


def test_key_skew_profile_golden(spark):
    """Keys a×8, b×1, c×1, d×2 → bins {0: 2 keys/2 rows, 1: 1/2,
    3: 1/8}; skew_factor = 8/3, max_key_share = 8/12."""
    from v3io_tsdb_spark.functions.skew import key_skew_profile

    rows = [("a",)] * 8 + [("b",)] + [("c",)] + [("d",)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = {r["bin"]: r for r in key_skew_profile(df, "k").collect()}
    assert set(out) == {0, 1, 3}
    assert (out[0]["n_keys"], out[0]["n_rows"]) == (2, 2)
    assert (out[1]["n_keys"], out[1]["n_rows"]) == (1, 2)
    assert (out[3]["n_keys"], out[3]["n_rows"]) == (1, 8)
    for r in out.values():
        assert math.isclose(r["skew_factor"], 8 / 3, rel_tol=1e-12)
        assert math.isclose(r["max_key_share"], 8 / 12, rel_tol=1e-12)
    assert math.isclose(out[3]["bin_row_share"], 8 / 12, rel_tol=1e-12)


def test_key_skew_profile_no_data_sized_join(spark):
    """The global one-row stats attach via broadcast; the raw table is
    shuffled exactly once (the key count) — bins and the global reduce
    aggregate the |keys|-sized counts, never the data."""
    from v3io_tsdb_spark.functions.skew import key_skew_profile

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    plan = _plan(key_skew_profile(df, "k"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan, plan[:1200]
