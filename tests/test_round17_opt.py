"""Round-17 optimization-path tests: batched det ladders, the
driver-side cooccur dictionary, the (h60, h60b) wide shingle key, and
the bounded driver probes (hot-shingle set, CC size probe) with their
distributed fallbacks."""

import math

import pytest
from pyspark.sql import functions as F


# -- with_det_many -----------------------------------------------------------

SWEEP = [1e-9, 1e-6, 0.001, 0.5, 0.999999, 1.0, 1.5, 2.0, math.e, 10.0,
         123.456, 1e6, 1e12, 7.0 / 3.0, 0.1, 2.0 ** 52]


def test_det_many_independent_matches_sequential(spark):
    """Two independent ln ladders emitted in ONE SELECT produce doubles
    bit-identical to the sequential with_det_ln emissions (the r16
    single-ladder form) and to the pure-Python reference."""
    from v3io_tsdb_spark.functions.detmath import (
        det_ln_py, with_det_ln, with_det_many,
    )

    df = spark.createDataFrame([(v, v * 3.0) for v in SWEEP], "x double, y double")
    seq = with_det_ln(df, "_la", F.col("x"), prefix="_p1_")
    seq = with_det_ln(seq, "_lb", F.col("y"), prefix="_p2_")
    bat = with_det_many(df, [
        ("ln", "_la", F.col("x"), "_p1_"),
        ("ln", "_lb", F.col("y"), "_p2_"),
    ])
    a = {r["x"]: (r["_la"], r["_lb"]) for r in seq.collect()}
    b = {r["x"]: (r["_la"], r["_lb"]) for r in bat.collect()}
    assert a == b
    for v in SWEEP:
        assert a[v][0] == det_ln_py(v)


def test_det_many_dependent_string_x(spark):
    """A dependent exp(c·ln r) pair — the exp's input is a SQL string
    referencing the ln's out as a lateral alias — matches the
    sequential Column emission exactly."""
    from v3io_tsdb_spark.functions.detmath import (
        _sql_double, with_det_exp, with_det_ln, with_det_many,
    )

    c = 0.63
    df = spark.createDataFrame([(v,) for v in SWEEP], "x double")
    seq = with_det_ln(df, "_lnr", F.col("x"), prefix="_dl_")
    seq = with_det_exp(seq, "_sc", F.lit(c) * F.col("_lnr"), prefix="_de_")
    bat = with_det_many(df, [
        ("ln", "_lnr", F.col("x"), "_dl_"),
        ("exp", "_sc", f"{_sql_double(c)} * _lnr", "_de_"),
    ])
    a = {r["x"]: (r["_lnr"], r["_sc"]) for r in seq.collect()}
    b = {r["x"]: (r["_lnr"], r["_sc"]) for r in bat.collect()}
    assert a == b


def test_det_many_duplicate_prefix_falls_back(spark):
    """Duplicate prefixes can't share one SELECT — the guard routes
    them through the sequential _with_program fallback, which computes
    each ladder (and drops its temps) before the next."""
    from v3io_tsdb_spark.functions.detmath import det_ln_py, with_det_many

    df = spark.createDataFrame([(2.0, 3.0)], "x double, y double")
    out = with_det_many(df, [
        ("ln", "_la", F.col("x"), "_p_"),
        ("ln", "_lb", F.col("y"), "_p_"),
    ]).collect()[0]
    assert out["_la"] == det_ln_py(2.0)
    assert out["_lb"] == det_ln_py(3.0)


# -- cooccur_pmi driver-side dictionary --------------------------------------

@pytest.fixture()
def pmi_docs(spark):
    rows = []
    for i in range(40):
        base = f"alpha beta gamma delta epsilon{i % 7} zeta{i % 5} theta"
        rows.append((i, base + (" shared tail phrase" if i % 2 == 0 else "")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cooccur_checkpointed_dict_orientation(spark, pmi_docs):
    """The r17 checkpointed-dictionary cooccur keeps the declared
    shape: pairs oriented term_a < term_b in Spark's string order
    (checked as UTF-8 bytes, including non-ASCII terms), counts
    positive, pmi finite."""
    from v3io_tsdb_spark.functions.text import cooccur_pmi

    out = cooccur_pmi(pmi_docs, min_df=2, max_df=30, min_pair=2).collect()
    assert len(out) > 0
    for r in out:
        assert r["term_a"].encode("utf-8") < r["term_b"].encode("utf-8")
        assert r["c_ab"] >= 2 and r["c_a"] >= r["c_ab"] and r["c_b"] >= r["c_ab"]

    docs = spark.createDataFrame(
        [(i, "émile zola Über café") for i in range(4)],
        "doc_id long, text string",
    )
    nasc = cooccur_pmi(docs, n=1, min_df=2, max_df=10, min_pair=2).collect()
    assert nasc
    for r in nasc:
        assert r["term_a"].encode("utf-8") < r["term_b"].encode("utf-8")


# -- wide shingle key --------------------------------------------------------

def test_jaccard_wide_key_ignores_h60_collision(spark):
    """A fabricated h60 collision between DISTINCT shingles must not
    inflate the intersection: the candidate join keys on (h60, h60b).
    (With the old h60-only key this pair counted inter=2 and scored
    jaccard 1.0.)"""
    from v3io_tsdb_spark.functions.dedup import ngram_jaccard_pairs

    postings = spark.createDataFrame(
        [
            # doc 1: shingles A, C     doc 2: shingles B, C
            # A and B collide on h60 but differ on h60b (and on g)
            (1, 2, "shingle A", 77, 101),
            (1, 2, "shingle C", 5, 500),
            (2, 2, "shingle B", 77, 202),
            (2, 2, "shingle C", 5, 500),
        ],
        "id long, n_sh int, g string, h60 long, h60b long",
    )
    dfs = postings.groupBy("g").agg(F.count("*").alias("df"))
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    out = ngram_jaccard_pairs(
        docs, threshold=0.2, max_df=None, inv=(postings, dfs)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # true intersection is {C} alone → 1/(2+2-1); the collided A/B
    # pair would have pushed this to 2/2 = 1.0
    assert abs(r["jaccard"] - round(1.0 / 3.0 + 1e-9, 6)) < 1e-12


def test_shingle_index_carries_wide_key(spark):
    """shingle_index emits both md5 halves; h60b is the hex-16..30
    slice (independent of h60)."""
    from v3io_tsdb_spark.functions.dedup import shingle_index

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    rows = shingle_index(docs).collect()
    assert {"id", "n_sh", "g", "h60", "h60b"} <= set(rows[0].asDict())
    import hashlib

    for r in rows:
        h = hashlib.md5(r["g"].encode()).hexdigest()
        assert r["h60"] == int(h[:15], 16)
        assert r["h60b"] == int(h[15:30], 16)


def test_hot_probe_distributed_fallback(spark, monkeypatch):
    """Forcing the hot-shingle probe past its driver bound
    (_HOT_CAP=0) routes the cap path through the distributed
    anti/semi joins — identical pair output."""
    from v3io_tsdb_spark.functions import dedup as dedup_mod
    from v3io_tsdb_spark.functions.dedup import (
        read_shingle_index, shingle_write_index,
    )

    docs = spark.createDataFrame(
        [(i, "common trigram words here plus unique%d tail%d end" % (i, i))
         for i in range(12)] +
        [(100, "near duplicate pair body one two three four"),
         (101, "near duplicate pair body one two three four five")],
        "doc_id long, text string",
    )
    import tempfile

    path = tempfile.mkdtemp(prefix="shidx17_")
    shingle_write_index(docs, path)
    inv = read_shingle_index(spark, path)
    args = dict(threshold=0.3, max_df=5, inv=inv)
    fast = sorted(map(tuple, dedup_mod.ngram_jaccard_pairs(docs, **args).collect()))
    monkeypatch.setattr(dedup_mod, "_HOT_CAP", 0)
    slow = sorted(map(tuple, dedup_mod.ngram_jaccard_pairs(docs, **args).collect()))
    assert fast == slow
    assert len(fast) > 0


# -- connected components probe ---------------------------------------------

def test_cc_probe_paths_agree(spark, monkeypatch):
    """Past the take() probe bound, a count() arbitrates: mid-size
    graphs still take the driver union-find (re-collect), big ones the
    distributed loop — all three paths produce the same components."""
    from v3io_tsdb_spark.functions import dedup as dedup_mod

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21)],
        "id_a long, id_b long",
    )
    want = sorted(map(tuple, dedup_mod.connected_components(edges).collect()))
    monkeypatch.setattr(dedup_mod, "_CC_PROBE", 2)
    mid = sorted(map(tuple, dedup_mod.connected_components(
        edges, small_cutoff=1_000_000).collect()))
    big = sorted(map(tuple, dedup_mod.connected_components(
        edges, small_cutoff=2).collect()))
    assert want == mid == big


# -- single-payload text_stats / shingles emission ---------------------------

def test_text_stats_emission_golden(spark):
    """The r17 selectExpr-emitted text_stats pins the exact values of
    the Column form it replaced (goldens captured from a collected
    old-vs-new parity run on the sf0.01 corpus + this edge fixture:
    empty text, whitespace-only, stopword-heavy en, de, zh)."""
    from v3io_tsdb_spark.functions.text import text_stats

    edge = spark.createDataFrame(
        [(1, ""), (2, "   "),
         (3, "the the the and of to a in is that it for extra"),
         (5, "Der der UND das ist von zu mit den ein"),
         (7, "的 是 在 了 和 有 我 他 这 中 extra words here now ok fine")],
        "doc_id long, text string")
    got = [tuple(r) for r in text_stats(edge).orderBy("doc_id").collect()]
    assert got == [
        (1, 0, 0, 0.0, 0.0, "und", 0.0, "d41d8cd98f00b204e9800998ecf8427e"),
        (2, 3, 0, 0.0, 0.0, "und", 0.0, "d41d8cd98f00b204e9800998ecf8427e"),
        (3, 47, 13, 2.692308, 0.923077, "en", 1.0,
         "eb84e39ba5fd723b985779d48848bf27"),
        (5, 38, 10, 2.9, 0.0, "de", 0.666667,
         "7d65847154806b76feed404666c7c8fa"),
        (7, 48, 16, 2.0625, 0.0, "zh", 0.666667,
         "acb2a86bc061db190bc24c1c295fbfc6"),
    ]


def test_shingles_sql_matches_column(spark):
    """shingles_sql must explode to exactly shingles_col's rows —
    including the short-doc whole-text fallback and non-ASCII."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.functions.dedup import shingles_col, shingles_sql

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "one two"), (3, ""), (4, "solo"),
         (5, "Ünïcode tokens RIGHT here and more of them")],
        "doc_id long, text string")
    for n in (2, 3, 8):
        a = sorted(map(tuple, docs.select(
            "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("g")
        ).collect()))
        b = sorted(map(tuple, docs.selectExpr(
            "doc_id", f"explode({shingles_sql('`text`', n)}) AS g"
        ).collect()))
        assert a == b and a


# -- MMR incremental max_sim --------------------------------------------------

def test_mmr_incremental_matches_full_recompute(spark):
    """The running per-candidate max_sim must reproduce the original
    full-recompute greedy walk exactly — including an all-negative
    cosine neighborhood, where the max is over cosines alone (not
    clamped at the empty-set 0.0)."""
    from v3io_tsdb_spark.functions.similarity import (
        _round6_half_up, mmr_topk,
    )

    vecs = [
        (0, [1.0, 0.2, 0.0, 0.1]),
        (1, [0.9, 0.3, 0.05, 0.0]),
        (2, [-1.0, -0.2, 0.0, -0.1]),   # anti-correlated with most
        (3, [0.0, 1.0, -0.4, 0.2]),
        (4, [0.05, -0.9, 0.8, -0.3]),
        (5, [0.5, 0.5, 0.5, 0.5]),
        (6, [-0.5, 0.4, -0.6, 0.9]),
    ]
    q = [1.0, 0.1, 0.0, 0.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    got = [tuple(r) for r in mmr_topk(df, q, k=5, lam=0.3, prefilter_m=7)
           .orderBy("rank").collect()]

    # reference: the pre-r17 full-recompute walk over the same pool
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    # _round6_half_up adds the +1e-9 shift itself (the round(x+1e-9, 6)
    # mirror), so it is applied to the raw cosine here
    rel = {i: _round6_half_up(cos(v, q)) for i, v in vecs}
    remaining = {i: (v, rel[i]) for i, v in vecs}
    selected, want = [], []
    for rank in range(1, 6):
        best = None
        for cid in sorted(remaining):
            v, rl = remaining[cid]
            msim = max((_round6_half_up(cos(v, s)) for s in selected), default=0.0)
            score = _round6_half_up(0.3 * rl - 0.7 * msim)
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, rl, msim, score)
        _, cid, rl, msim, score = best
        want.append((rank, cid, float(rl), float(msim), float(score)))
        selected.append(remaining.pop(cid)[0])
    assert got == want


# -- bloom empty-bitmap edge --------------------------------------------------

def test_bloom_empty_bitmap_analyzes(spark):
    """ADVICE r16 #5: an empty bitmap list must stay analyzable (the
    bare array() literal types ARRAY<VOID> without the cast)."""
    from v3io_tsdb_spark.functions.bloom import bloom_might_contain

    df = spark.range(3).select(F.col("id").alias("user_id"))
    out = df.where(bloom_might_contain(F.col("user_id"), [0] * 1024)).collect()
    assert out == []  # all-zero bitmap: nothing may be contained
