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


def test_mixture_weights_golden(spark):
    """Hand-computed recipe: weights move the token mix to the target;
    sources absent from the recipe get weight 0."""
    from v3io_tsdb_spark.functions.sampling import mixture_weights

    rows = [
        (1, "a", "w w w w"),        # a: 6 tokens
        (2, "a", "w w"),
        (3, "b", "x x x"),          # b: 3 tokens
        (4, "c", "y"),              # c: 1 token, not in target
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r
        for r in mixture_weights(df, {"a": 1.0, "b": 1.0}).collect()
    }
    assert got["a"]["n_docs"] == 2 and got["a"]["n_tokens"] == 6
    assert got["a"]["actual_share"] == pytest.approx(0.6, abs=1e-6)
    assert got["a"]["target_share"] == pytest.approx(0.5, abs=1e-6)
    # weight = 0.5 / 0.6
    assert got["a"]["weight"] == pytest.approx(10 * 0.5 / 6, abs=1e-6)
    assert got["b"]["weight"] == pytest.approx(10 * 0.5 / 3, abs=1e-6)
    assert got["c"]["target_share"] == 0.0 and got["c"]["weight"] == 0.0
    # expected token mix under the weights hits the target exactly
    wa = got["a"]["weight"] * 6
    wb = got["b"]["weight"] * 3
    assert wa / (wa + wb) == pytest.approx(0.5, abs=1e-5)


def test_winnow_decontaminate_catches_embedded_passage(spark):
    """A doc that embeds one verbatim >=8-token eval passage inside
    otherwise-novel text must be flagged (the winnowing guarantee);
    clean docs must not be."""
    from v3io_tsdb_spark.functions.text import winnow_decontaminate

    passage = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "novel words alpha beta " + passage + " gamma delta end run"),
        (2, "completely different content with no overlap at all here"),
        (13, "eval question says " + passage + " answer below"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = df.where("doc_id % 10 != 3")
    ev = df.where("doc_id % 10 = 3")
    out = winnow_decontaminate(train, ev, min_shared=2)
    flagged = {r["doc_id"]: r["n_shared_fp"] for r in out.collect()}
    assert 1 in flagged and flagged[1] >= 2
    assert 2 not in flagged


def test_winnow_decontaminate_indexed_equals_direct(spark, tmp_path):
    """Serving both sides from a persisted winnow index must return
    exactly the direct-computation result (append==rebuild discipline),
    and the indexed plan must never re-read text."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import (
        read_winnow_index,
        winnow_decontaminate,
        winnow_write_index,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "widx")
    winnow_write_index(docs, path, k=5, w=4)
    idx = read_winnow_index(spark, path)
    train = docs.where(F.col("doc_id") % 10 != 3)
    ev = docs.where(F.col("doc_id") % 10 == 3)
    direct = winnow_decontaminate(train, ev, min_shared=2)
    indexed = winnow_decontaminate(
        train, ev, min_shared=2,
        fps=idx.where(F.col("doc_id") % 10 != 3),
        eval_fps=idx.where(F.col("doc_id") % 10 == 3),
    )
    d = {(r["doc_id"], r["n_shared_fp"]) for r in direct.collect()}
    i = {(r["doc_id"], r["n_shared_fp"]) for r in indexed.collect()}
    assert i == d and len(d) > 0
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan and "md5(" not in plan
    assert "documents.parquet" not in plan
    assert "BroadcastHashJoin" in plan  # eval fp set broadcasts


def test_mixture_weights_corpus_never_shuffled(spark):
    """Plan audit: one aggregate over the scan + a broadcast of the
    one-row total — no sort-merge join, no corpus exchange beyond the
    |sources|-row aggregate."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.sampling import mixture_weights

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = mixture_weights(
        docs, {"src0": 0.5, "src1": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
