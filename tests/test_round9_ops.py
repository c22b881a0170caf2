"""Round-9 additions: zero-norm guard for group diversity (ADVICE r8)
and the TakeOrdered bm25 rank contract."""

import math

import pytest


def test_group_diversity_zero_norm_vectors_excluded(spark):
    """A zero embedding has no direction, hence no defined cosine with
    anything: it must be dropped entirely — excluded from n too, not
    just from the per-dim sums (counting it would silently deflate the
    group mean; and Spark's non-ANSI x/0.0 -> NULL vs DuckDB's inf
    would diverge the engines)."""
    from v3io_tsdb_spark.functions.similarity import group_diversity

    rows = [
        (1, 1, [1.0, 2.0]),
        (2, 1, [2.0, 4.0]),     # parallel with row 1 -> cosine 1.0
        (3, 1, [0.0, 0.0]),     # zero vector: must not count
        (4, 2, [0.0, 0.0]),     # group of only-zero vectors: no row
        (5, 3, [3.0, 0.0]),
        (6, 3, [0.0, 0.0]),     # zero + one real -> singleton -> null
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    got = {
        r["label"]: (r["n"], r["mean_pairwise_cosine"])
        for r in group_diversity(df, "label").collect()
    }
    assert got[1][0] == 2
    assert got[1][1] == pytest.approx(1.0, abs=1e-6)
    assert 2 not in got
    assert got[3] == (1, None)


def test_bm25_rank_is_dense_sequential_after_limit(spark):
    """rank must be 1..k over the TakeOrdered result, score-desc with
    id tiebreak — identical to the old rank-window contract."""
    from v3io_tsdb_spark.functions.text import bm25_topk

    rows = [(i, "hash join " * (i % 4 + 1) + "filler") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ("hash", "join"), k=5).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # ties (same text length pattern) break by ascending id
    for a, b in zip(out, out[1:]):
        if a["score"] == b["score"]:
            assert a["doc_id"] < b["doc_id"]
