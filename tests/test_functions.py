"""Training-data pipeline operators (M10): dedup, similarity, text,
multimodal — over the sf0.001 test tables (TESTDATA.md)."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from v3io_tsdb_spark.datasets import load_table

    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    from v3io_tsdb_spark.datasets import load_table

    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def true_pairs(docs):
    from v3io_tsdb_spark.functions.dedup import ngram_jaccard_pairs

    return {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}


def test_exact_dedup(docs, spark):
    from v3io_tsdb_spark.functions.dedup import exact_dedup, exact_dedup_stats

    stats = exact_dedup_stats(docs).first()
    assert stats["n_docs"] == 500
    assert stats["n_unique"] + stats["n_dup_docs"] == 500
    out = exact_dedup(docs)
    kept = out.where("keep").count()
    assert kept == stats["n_unique"]
    # every dropped doc points at a kept representative with lower id
    bad = out.where(~F.col("keep") & (F.col("dup_of") >= F.col("doc_id"))).count()
    assert bad == 0


def test_minhash_precision_recall(docs, true_pairs):
    from v3io_tsdb_spark.functions.dedup import minhash_dedup

    got = {(r["id_a"], r["id_b"]) for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert got, "no pairs found"
    assert got <= true_pairs, "minhash produced false positives above threshold"
    assert len(got) / len(true_pairs) >= 0.8, (len(got), len(true_pairs))


def test_simhash_precision(docs, true_pairs):
    from v3io_tsdb_spark.functions.dedup import simhash_near_dup_pairs

    got = {(r["id_a"], r["id_b"]) for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    assert got and got <= true_pairs


def test_text_stats_basics(docs):
    from v3io_tsdb_spark.functions.text import text_stats

    out = text_stats(docs)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r["n_chars"] >= 0 and r["n_tokens"] >= 0
        assert 0.0 <= r["stopword_ratio_en"] <= 1.0
        assert 0.0 <= r["quality"] <= 1.0
        assert len(r["fingerprint"]) == 32
        assert r["lang_pred"] in ("en", "es", "fr", "de", "zh", "und")


def test_cosine_topk_exact(emb):
    from v3io_tsdb_spark.functions.similarity import cosine_topk

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(emb, qvec, k=10).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == pytest.approx(1.0, abs=1e-4)
    sims = [r["cosine"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_subset_of_exact_ranking(emb):
    from v3io_tsdb_spark.functions.similarity import cosine_topk, lsh_bucketed_topk

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(emb, qvec, k=500).collect()}
    approx = lsh_bucketed_topk(emb, qvec, k=10, probe_hamming=2).collect()
    assert approx[0]["vec_id"] == 0
    for r in approx:  # scores must agree with the exact computation
        assert r["cosine"] == pytest.approx(exact[r["vec_id"]], abs=1e-5)


def test_ivf_topk(emb):
    from v3io_tsdb_spark.functions.similarity import cosine_topk, ivf_build, ivf_topk

    assignments, centroids = ivf_build(emb, n_clusters=8, iters=2)
    assert assignments.count() == 500
    assert len(centroids) == 8 and all(len(c) == len(centroids[0]) for c in centroids)
    n_assigned = assignments.select("cluster").distinct().count()
    assert n_assigned >= 2  # quantizer actually separates the data

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    got = ivf_topk(emb, qvec, assignments, centroids, k=10, n_probe=4)
    rows = got.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == pytest.approx(1.0, abs=1e-4)
    exact_ids = [r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()]
    recall = len(set(r["vec_id"] for r in rows) & set(exact_ids)) / 10
    assert recall >= 0.3, recall  # random gaussian data: probes cover ~half


def test_multimodal_plumbing(docs):
    from v3io_tsdb_spark.functions.multimodal import attach_fake_payload, extract_features

    feats = extract_features(attach_fake_payload(docs), fake=True)
    rows = feats.collect()
    assert len(rows) == 500
    assert all(r["n_bytes"] > 0 and len(r["content_sha"]) == 64 for r in rows[:20])


def test_plane_matrix_deterministic_and_bounded():
    from v3io_tsdb_spark.functions.similarity import plane_matrix

    a = plane_matrix(4, 16)
    b = plane_matrix(4, 16)
    assert a == b
    assert all(-1.0 <= x <= 1.0 for row in a for x in row)
    # distinct planes
    assert a[0] != a[1]


def test_md5_int60_matches_duckdb(spark):
    import duckdb

    from v3io_tsdb_spark.functions.dedup import md5_int60

    vals = ["abc", "hello world", "x", ""]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select(md5_int60(F.col("s")).alias("h")).collect()
    )
    want = [duckdb.sql(f"SELECT ('0x' || substr(md5('{v}'), 1, 15))::BIGINT").fetchone()[0]
            for v in vals]
    assert [r["h"] for r in got] == want


def test_ivf_persisted_index_search(emb, spark, tmp_path):
    from v3io_tsdb_spark.functions.similarity import (
        cosine_topk, ivf_read_centroids, ivf_search, ivf_write_index,
    )

    path = str(tmp_path / "ivf")
    cents = ivf_write_index(emb, path, n_clusters=8, iters=2)
    assert len(cents) == 8 and ivf_read_centroids(path) == cents
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    # all-probe search over the persisted index == exact top-k
    got = ivf_search(spark, path, qvec, k=10, n_probe=8).collect()
    exact = cosine_topk(emb, qvec, k=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    # probed search reads only the probed cluster partitions
    plan = ivf_search(spark, path, qvec, k=10, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan


def test_ngram_jaccard_max_df_cap_keeps_planted_pairs(docs, true_pairs):
    from v3io_tsdb_spark.functions.dedup import ngram_jaccard_pairs

    capped = {(r["id_a"], r["id_b"])
              for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=100).collect()}
    assert capped == true_pairs


def test_ngram_jaccard_hot_pair_exact_verify(spark):
    """When the df cap FIRES, pairs touching a hot (high-df) shingle
    must still get the EXACT jaccard via the array re-verify path —
    the capped count alone would under-report their intersection."""
    from v3io_tsdb_spark.functions.dedup import ngram_jaccard_pairs

    stop = "the quick brown fox"  # one shared stop-shingle across all docs
    rows = [(i, f"{stop} unique{i} filler{i} pad{i} tail{i}") for i in range(20)]
    # two near-dup docs sharing the stop-shingle AND distinctive text
    rows += [(100, f"{stop} alpha beta gamma delta epsilon zeta"),
             (101, f"{stop} alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3, max_df=None).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, threshold=0.3, max_df=5).collect()}
    assert (100, 101) in capped  # the near-dup pair survives the cap
    assert capped[(100, 101)] == exact[(100, 101)]  # and its score is exact


def test_lsh_persisted_index_search(emb, spark, tmp_path):
    from v3io_tsdb_spark.functions.similarity import (
        lsh_bucketed_topk, lsh_search, lsh_write_index,
    )

    path = str(tmp_path / "lsh")
    lsh_write_index(emb, path, n_planes=6, dim=64)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = lsh_search(spark, path, qvec, k=10, probe_hamming=3).collect()
    # persisted-index search == the full-scan signature filter, exactly
    scan = lsh_bucketed_topk(emb, qvec, k=10, probe_hamming=3, dim=64).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in scan
    ]
    # probed search prunes to the probed sig partitions (an INDEX read)
    plan = (
        lsh_search(spark, path, qvec, k=10, probe_hamming=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "sig" in plan


import pytest as _pytest


@_pytest.mark.parametrize("small_cutoff", [1_000_000, 0])
def test_connected_components_chain_and_clusters(spark, small_cutoff):
    """Both CC paths (driver union-find / distributed min-label
    propagation) converge on a multi-hop chain (diameter > 1 forces
    real iteration) plus a disjoint pair and pick min-id
    representatives."""
    from v3io_tsdb_spark.functions.dedup import connected_components, dedup_clusters

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 7), (20, 21)], "id_a long, id_b long"
    )
    cc = {
        r["id"]: r["comp"]
        for r in connected_components(edges, small_cutoff=small_cutoff).collect()
    }
    assert cc == {3: 3, 5: 3, 9: 3, 7: 3, 20: 20, 21: 20}
    keep = {r["id"]: r["keep"] for r in dedup_clusters(edges).collect()}
    assert keep == {3: True, 5: False, 9: False, 7: False, 20: True, 21: False}


def test_connected_components_long_chain_halving(spark):
    """Path halving converges in O(log n) rounds: a 40-hop chain far
    exceeds plain propagation's reach at max_iter=10 but the
    pointer-doubled variant finishes, and non-convergence raises
    instead of returning split components. (small_cutoff=0 forces the
    distributed path; the default would take driver union-find.)"""
    import pytest
    from v3io_tsdb_spark.functions.dedup import connected_components

    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    cc = {
        r["id"]: r["comp"]
        for r in connected_components(edges, max_iter=10, small_cutoff=0).collect()
    }
    assert set(cc.values()) == {0} and len(cc) == n + 1
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, small_cutoff=0)


def test_connected_components_paths_agree(spark):
    """Driver union-find and distributed propagation produce identical
    (id, comp) labelings on a random graph."""
    import random

    from v3io_tsdb_spark.functions.dedup import connected_components

    rng = random.Random(11)
    edges = spark.createDataFrame(
        [(rng.randrange(120), rng.randrange(120)) for _ in range(90)],
        "id_a long, id_b long",
    )
    fast = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    dist = {
        r["id"]: r["comp"]
        for r in connected_components(edges, small_cutoff=0).collect()
    }
    assert fast == dist


def test_shingle_index_matches_direct_paths(docs, tmp_path_factory, spark):
    """The persisted shingle feature table must reproduce every direct
    (text-scanning) sketch bit-for-bit: same jaccard pairs, same
    minhash estimates, same simhash pairs."""
    from v3io_tsdb_spark.functions.dedup import (
        minhash_dedup,
        ngram_jaccard_pairs,
        read_shingle_index,
        shingle_write_index,
        simhash_near_dup_pairs,
    )

    path = str(tmp_path_factory.mktemp("shidx") / "idx")
    shingle_write_index(docs, path)
    inv = read_shingle_index(spark, path)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(ngram_jaccard_pairs(docs, threshold=0.5, max_df=100, inv=inv)) == rows(
        ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    )
    assert rows(minhash_dedup(docs, threshold=0.5, inv=inv)) == rows(
        minhash_dedup(docs, threshold=0.5)
    )
    assert rows(simhash_near_dup_pairs(docs, max_hamming=3, inv=inv)) == rows(
        simhash_near_dup_pairs(docs, max_hamming=3)
    )


def test_frame_sample_windows_and_fingerprints(docs, spark):
    """frame_sample emits one row per 64-byte window at the every_n
    stride, fingerprinting each window's hex encoding (the documented
    oracle-parity stub)."""
    import hashlib

    from v3io_tsdb_spark.functions.multimodal import attach_fake_payload, frame_sample

    some = attach_fake_payload(docs.orderBy("doc_id").limit(5))
    out = frame_sample(some, every_n=2).collect()
    texts = {r["doc_id"]: r["text"] for r in some.select("doc_id", "text").collect()}
    expect = []
    for doc_id, text in texts.items():
        payload = text.encode()
        for idx, off in enumerate(range(0, max(len(payload), 1), 128)):
            expect.append(
                (doc_id, idx, hashlib.sha256(payload[off : off + 64].hex().encode()).hexdigest())
            )
    assert sorted((r["doc_id"], r["frame_idx"], r["frame_sha"]) for r in out) == sorted(expect)
    # multi-frame docs exist (docs are 48-600 bytes at stride 128)
    assert max(r["frame_idx"] for r in out) >= 1


def test_assign_split_deterministic_proportions(docs, spark):
    from v3io_tsdb_spark.functions.sampling import assign_split

    out = assign_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"} and counts["train"] > 0
    n = sum(counts.values())
    assert n == 500
    assert 0.8 < counts["train"] / n < 0.97  # 90% ±
    # repartitioning must not move any row between splits
    again = assign_split(docs.repartition(13), "doc_id")
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()}
    assert a == b


def test_deterministic_sample_stable(docs, spark):
    from v3io_tsdb_spark.functions.sampling import deterministic_sample

    s1 = {r["doc_id"] for r in deterministic_sample(docs, 0.2, "doc_id").select("doc_id").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs.repartition(7), 0.2, "doc_id").select("doc_id").collect()}
    assert s1 == s2 and 0.1 < len(s1) / 500 < 0.3
    # different salt draws a different (decorrelated) set
    s3 = {r["doc_id"] for r in deterministic_sample(docs, 0.2, "doc_id", salt="other").select("doc_id").collect()}
    assert s3 != s1


def test_decontaminate_flags_eval_members(docs, spark):
    from v3io_tsdb_spark.functions.dedup import decontaminate

    ev = docs.where(F.col("doc_id") < 3)
    out = {r["doc_id"]: r for r in decontaminate(docs, ev, n=8).collect()}
    # eval docs are in the corpus here, so each is contaminated by itself
    for i in range(3):
        assert i in out and out[i]["n_eval_docs"] >= 1 and out[i]["first_eval_id"] <= i


def test_shingle_append_index_incremental(docs, tmp_path_factory, spark):
    """Appending docs to a persisted index (append-only postings +
    merged df sidecar) must yield the SAME index state as building from
    the full corpus — including df counts, which gate the jaccard
    hot-shingle cap."""
    from v3io_tsdb_spark.functions.dedup import (
        ngram_jaccard_pairs,
        read_shingle_index,
        shingle_append_index,
        shingle_write_index,
    )

    base = tmp_path_factory.mktemp("shidx_app")
    inc_path, full_path = str(base / "inc"), str(base / "full")
    shingle_write_index(docs.where(F.col("doc_id") < 400), inc_path)
    shingle_append_index(docs.where(F.col("doc_id") >= 400), inc_path)
    shingle_write_index(docs, full_path)
    inc, full = read_shingle_index(spark, inc_path), read_shingle_index(spark, full_path)
    assert sorted(map(tuple, inc[0].collect())) == sorted(map(tuple, full[0].collect()))
    assert sorted(map(tuple, inc[1].collect())) == sorted(map(tuple, full[1].collect()))
    # and the query result off the appended index matches direct
    a = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=100, inv=inc).collect())
    b = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=100).collect())
    assert a == b


def test_corpus_pipeline_checkpoint_equivalence(spark):
    """materialize_kept only changes execution (one materialized
    boundary vs recomputed subtree), never the result set."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.pipeline import corpus_pipeline

    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 3)
    ev = docs.where(F.col("doc_id") % 10 == 3)
    a = corpus_pipeline(corpus, ev, materialize_kept=True)
    b = corpus_pipeline(corpus, ev, materialize_kept=False)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_repetition_stats_known_values(spark):
    from v3io_tsdb_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a b a b"), (3, "x y z"), (4, "w")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(df).collect()}
    assert abs(r[1]["dup_word_ratio"] - 2 / 3) < 1e-9
    assert abs(r[1]["dup_bigram_ratio"] - 1 / 2) < 1e-9  # [a a, a a]
    assert abs(r[2]["dup_bigram_ratio"] - 1 / 3) < 1e-9  # [a b, b a, a b]
    assert r[3]["dup_word_ratio"] == 0.0 and r[3]["dup_trigram_ratio"] == 0.0
    assert r[4]["dup_bigram_ratio"] == 0.0  # fewer tokens than n


def test_pack_sequences_concat_chunk(spark):
    from v3io_tsdb_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "train", "en", 100), (2, "train", "en", 100), (3, "train", "en", 100),
         (4, "train", "en", 500),  # longer than the budget: spans packs
         (5, "train", "de", 100),  # separate group restarts at 0
         (6, "val", "en", 100)],
        "doc_id long, split string, lang string, n_tokens long",
    )
    r = {x["doc_id"]: (x["pack_id"], x["pack_offset"])
         for x in pack_sequences(df, budget=256).collect()}
    assert r[1] == (0, 0)
    assert r[2] == (0, 100)
    assert r[3] == (0, 200)       # starts at 200, spills into pack 1
    assert r[4] == (1, 44)        # starts at 300 = 256 + 44
    assert r[5] == (0, 0)
    assert r[6] == (0, 0)


def test_scrub_pii_sentinels_and_order(spark):
    from v3io_tsdb_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.na+x@ex-a.co.uk thanks"),
            (2, "server 192.168.001.12 is up"),
            (3, "call +1 555 123 4567 today"),
            (4, "a@b.io or 10.0.0.1 or 555-123-4567"),
            (5, "clean text, no pii at all"),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in scrub_pii(df).collect()}
    assert r[1]["n_emails"] == 1 and r[1]["scrubbed"] == "mail me at <EMAIL> thanks"
    assert r[2]["n_ips"] == 1 and r[2]["scrubbed"] == "server <IP> is up"
    assert r[3]["n_phones"] == 1 and r[3]["scrubbed"] == "call <PHONE> today"
    assert (r[4]["n_emails"], r[4]["n_ips"], r[4]["n_phones"]) == (1, 1, 1)
    assert r[4]["scrubbed"] == "<EMAIL> or <IP> or <PHONE>"
    assert r[5]["scrubbed"] == "clean text, no pii at all"
    assert (r[5]["n_emails"], r[5]["n_ips"], r[5]["n_phones"]) == (0, 0, 0)


def test_scrub_pii_counts_match_replacements(spark):
    """Counts are defined on the stage each regex actually runs on: a
    dotted quad inside an email DOMAIN is consumed by the email pass,
    so it must not count as an IP (n_ips == number of <IP> sentinels
    in the output, always)."""
    from v3io_tsdb_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "from a@1.2.3.4.com with love"),        # quad inside email domain
            (2, "a@1.2.3.4.com plus real 10.0.0.1"),    # one masked, one real
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in scrub_pii(df).collect()}
    assert r[1]["n_emails"] == 1 and r[1]["n_ips"] == 0
    assert r[1]["scrubbed"] == "from <EMAIL> with love"
    assert r[2]["n_emails"] == 1 and r[2]["n_ips"] == 1
    assert r[2]["scrubbed"] == "<EMAIL> plus real <IP>"
    for row in r.values():
        assert row["scrubbed"].count("<IP>") == row["n_ips"]


def test_stratified_sample_properties(spark):
    from v3io_tsdb_spark.functions.sampling import stratified_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
    )
    # rate 1.0 keeps the whole stratum; rate 0.0 (default) drops it
    kept = stratified_sample(df, {"a": 1.0}, "s", "k").collect()
    assert len(kept) == 1000 and all(r["s"] == "a" for r in kept)
    # nested thresholds: the 20% sample is a subset of the 50% sample
    s20 = {r["k"] for r in stratified_sample(df, {"a": 0.2}, "s", "k").collect()}
    s50 = {r["k"] for r in stratified_sample(df, {"a": 0.5}, "s", "k").collect()}
    assert s20 <= s50 and 0 < len(s20) < len(s50) < 1000
    # deterministic across invocations
    assert s20 == {r["k"] for r in stratified_sample(df, {"a": 0.2}, "s", "k").collect()}


def test_select_within_token_budget_prefix(spark):
    from v3io_tsdb_spark.functions.sampling import select_within_token_budget

    df = spark.createDataFrame(
        [  # (doc_id, lang, n_tokens, quality)
            (1, "en", 100, 1.0),
            (2, "en", 100, 0.9),
            (3, "en", 100, 0.9),   # quality tie -> id order
            (4, "en", 100, 0.5),   # crosses the 300 budget: excluded
            (5, "de", 250, 0.2),   # separate group, own budget
        ],
        "doc_id long, lang string, n_tokens long, quality double",
    )
    got = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in select_within_token_budget(df, budget=300).collect()
    )
    assert got == [(1, 100), (2, 200), (3, 300), (5, 250)]


def test_batch_topk_routing_and_ivf_batch(emb, spark, tmp_path):
    """Batch top-k auto-routing (X6/X7 scale path): the routing rule
    flips exactly at the pair budget, and the in-plan batch IVF search
    (query->probe mapping computed in Spark, no per-query driver loop)
    agrees with brute force exactly when every cluster is probed."""
    from v3io_tsdb_spark.functions.similarity import (
        batch_topk_auto,
        choose_batch_route,
        cosine_topk_per_query,
        ivf_batch_search,
        ivf_write_index,
    )

    # routing rule, both ways (and the no-index fallback)
    assert choose_batch_route(3, 500, None) == "brute"
    assert choose_batch_route(3, 500, "/idx", max_pairs=10_000) == "brute"
    assert choose_batch_route(100, 500, "/idx", max_pairs=10_000) == "ivf"
    assert choose_batch_route(100, 500, None, max_pairs=10_000) == "brute"

    path = str(tmp_path / "ivf_batch")
    ivf_write_index(emb, path, n_clusters=8, iters=2)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk_per_query(emb, queries, k=5).collect()
    full_probe = ivf_batch_search(spark, path, queries, k=5, n_probe=8).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, sorted(full_probe, key=key))) == sorted(
        map(tuple, sorted(brute, key=key))
    )

    # auto: below budget -> brute plan (nested-loop over broadcast
    # queries, no index scan); above -> index scan in the plan
    low = batch_topk_auto(emb, queries, k=5, index_path=path, max_pairs=10**9)
    high = batch_topk_auto(emb, queries, k=5, index_path=path, max_pairs=10, n_probe=8)
    lp = low._jdf.queryExecution().executedPlan().toString()
    hp = high._jdf.queryExecution().executedPlan().toString()
    # brute = nested-loop over the broadcast query set, no cluster column;
    # ivf = probe-join against the cluster-partitioned index (its only
    # nested loop is the tiny queries x centroid-matrix probe ranking)
    assert "BroadcastNestedLoopJoin" in lp and "cluster" not in lp
    assert "cluster" in hp
    assert sorted(map(tuple, high.collect())) == sorted(map(tuple, brute))


def test_top_n_per_group_exact_and_pruned(spark):
    """top_n_per_group returns EXACTLY the naive window's top N (the
    quantile ladder only discards provably-losing rows), and for a
    large group the survivor set entering the exact rank is a small
    fraction of the group."""
    from pyspark.sql import Window

    from v3io_tsdb_spark.functions.sampling import top_n_per_group

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 18_000, "en").otherwise("fr").alias("lang"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 1000.0).alias("quality"),
    )
    got = top_n_per_group(df, 10).select("lang", "doc_id", "quality", "rank")
    w = Window.partitionBy("lang").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("lang", "doc_id", "quality", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # tiny groups (< safety*n rows) must be exact too (no filtering)
    small = df.where(F.col("doc_id") < 25)  # 25 rows, all lang='en'
    got_s = top_n_per_group(small, 10).collect()
    want_s = (
        small.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)
    ).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in got_s) == sorted(
        (r["doc_id"], r["rank"]) for r in want_s
    )
    # pruning property: the broadcast-threshold filter keeps far fewer
    # rows than the group for the 18k-row group
    from v3io_tsdb_spark.functions.sampling import top_n_per_group as tn
    import re
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan  # ladder aggregate present
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ivf_append_index_incremental(emb, spark, tmp_path):
    """Index lifecycle: build on half the corpus, append the other
    half with frozen centroids — all-probe search over the appended
    index equals exact brute force over the FULL corpus (assignment
    quality affects pruning, never all-probe correctness)."""
    from v3io_tsdb_spark.functions.similarity import (
        cosine_topk, ivf_append_index, ivf_search, ivf_write_index,
    )

    path = str(tmp_path / "ivf_inc")
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)
    ivf_write_index(first, path, n_clusters=8, iters=2)
    ivf_append_index(second, path)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = ivf_search(spark, path, qvec, k=10, n_probe=8).collect()
    exact = cosine_topk(emb, qvec, k=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_priority_dedup_prefers_source(spark):
    """Identical texts across sources: the lexically-smallest source
    wins; within a source the lowest doc_id wins; uniques keep."""
    from v3io_tsdb_spark.functions.dedup import priority_dedup

    rows = [
        (1, "same text", "srcB"),
        (2, "same text", "srcA"),   # winner: srcA < srcB
        (3, "same text", "srcA"),   # loser to doc 2 (id tiebreak)
        (4, "unique", "srcZ"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in
           priority_dedup(df, [("source", False), ("doc_id", False)]).collect()}
    assert out[2]["keep"] and out[2]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 2
    assert not out[3]["keep"] and out[3]["dup_of"] == 2
    assert out[4]["keep"]


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    """A term unique to one doc outscores corpus-wide terms; rank
    ordering is (score desc, term asc); k bounds output per doc."""
    from v3io_tsdb_spark.functions.text import tfidf_top_terms

    rows = [
        (1, "common common zebra"),
        (2, "common common common"),
        (3, "common apple apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # doc1: zebra (df=1) beats common (df=3) despite tf 1 vs 2?
    # zebra: 1 * (ln(4/2)+1) = 1.693; common: 2 * (ln(4/4)+1) = 2.0 -> common first
    assert sorted(by_doc[1]) == [(1, "common"), (2, "zebra")]
    # doc3: apple tf=2 df=1 -> 2*1.693=3.386 beats common 1*1.0
    assert sorted(by_doc[3]) == [(1, "apple"), (2, "common")]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_lsh_append_index_incremental(emb, spark, tmp_path):
    """LSH index lifecycle (mirror of the IVF one): build on half the
    corpus, append the other half signed with the PERSISTED plane
    parameters — all-bucket search over the appended index equals exact
    brute force over the FULL corpus."""
    from v3io_tsdb_spark.functions.similarity import (
        cosine_topk, lsh_append_index, lsh_search, lsh_write_index,
    )

    path = str(tmp_path / "lsh_inc")
    dim = len(emb.select("embedding").first()["embedding"])
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)
    lsh_write_index(first, path, n_planes=4, dim=dim)
    lsh_append_index(second, path)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = lsh_search(spark, path, qvec, k=10, probe_hamming=4).collect()
    exact = cosine_topk(emb, qvec, k=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_extract_features_real_codec_without_pil():
    """Without Pillow the real path must raise (never silently fall
    back to the stub). Skipped where Pillow IS installed — the twin
    test below covers that environment."""
    import pytest as _pytest

    from v3io_tsdb_spark.functions.multimodal import extract_features, have_pil

    if have_pil():
        _pytest.skip("Pillow installed; real-codec raise path not reachable")
    with _pytest.raises(NotImplementedError):
        extract_features(None, fake=False)


def test_extract_features_real_codec_with_pil(spark):
    """Real PIL decode path (VERDICT r6 #7): build tiny PNGs in-process,
    run extract_features(fake=False), and check the features are the
    decoded pixel rows — deterministic and in [-1, 1]. Skips cleanly
    where Pillow is absent."""
    import io

    import pytest as _pytest

    PIL_Image = _pytest.importorskip("PIL.Image")

    from v3io_tsdb_spark.functions.multimodal import extract_features

    def png_bytes(shade):
        img = PIL_Image.new("L", (4, 4), color=shade)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(0, bytearray(png_bytes(0))), (1, bytearray(png_bytes(255)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_features(df, fake=False, dim=4).collect()}
    # uniform black image -> all -1; uniform white -> all +1
    assert out[0]["feature"] == [-1.0] * 4
    assert out[1]["feature"] == [1.0] * 4
    assert out[0]["n_bytes"] > 0 and len(out[0]["content_sha"]) == 64


def test_normalized_dedup_stats(spark):
    """X66: case/punct/spacing variants collapse to one cluster; the
    lowest id is canonical; distinct texts stay singletons."""
    from v3io_tsdb_spark.functions.text import normalized_dedup_stats

    rows = [
        (1, "Hello, World!"),
        (2, "hello   world"),
        (3, "HELLO WORLD."),
        (4, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalized_dedup_stats(df).collect()}
    assert out[1]["n_dups"] == 3 and out[1]["is_canonical"]
    assert out[2]["n_dups"] == 3 and not out[2]["is_canonical"]
    assert out[3]["norm_fp"] == out[1]["norm_fp"]
    assert out[4]["n_dups"] == 1 and out[4]["is_canonical"]
    assert out[4]["norm_fp"] != out[1]["norm_fp"]


def test_unigram_logprob(spark):
    """X65: mean log-prob matches the hand-computed add-alpha model,
    and a common-vocabulary doc outscores an unusual-vocabulary one."""
    import math

    from v3io_tsdb_spark.functions.text import unigram_logprob

    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "zyx qwv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df, alpha=0.5).collect()}
    # corpus: the:2 cat:2 sat:1 ran:1 zyx:1 qwv:1 -> N=8, V=6
    N, V, a = 8, 6, 0.5

    def p(c):
        return (c + a) / (N + a * V)

    def mn(c):
        # integer micro-nat quantization (text.micro_nats), the
        # order-free accumulation contract of VERDICT r11 #2
        return float(round(math.log(p(c)) * 1e6))

    exp1 = (mn(2) + mn(2) + mn(1)) / (1e6 * 3)
    exp3 = (mn(1) + mn(1)) / (1e6 * 2)
    assert out[1]["mean_logprob"] == pytest.approx(exp1, abs=1e-12)
    assert out[3]["mean_logprob"] == pytest.approx(exp3, abs=1e-12)
    assert out[1]["mean_logprob"] > out[3]["mean_logprob"]
    assert out[1]["n_tokens"] == 3 and out[3]["n_tokens"] == 2


def test_corpus_diff(spark):
    """X69: membership + fingerprint comparison across two snapshots."""
    from v3io_tsdb_spark.functions.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "bravo"), (3, "charlie EDITED"), (4, "delta")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # fingerprint (not raw equality): whitespace/case-only deltas are
    # NOT changes, matching exact-dedup's canonicalization
    new2 = spark.createDataFrame([(1, "  ALPHA ")], "doc_id long, text string")
    out2 = {r["doc_id"]: r["status"]
            for r in corpus_diff(old.where("doc_id = 1"), new2).collect()}
    assert out2 == {1: "unchanged"}


def test_label_cardinality(spark):
    """X70: per-key distinct/total/modal stats with deterministic
    (count, value) tie-break."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.catalog import label_cardinality

    rows = [({"uid": "1", "os": "linux"},), ({"uid": "2", "os": "linux"},),
            ({"uid": "3", "os": "mac"},), ({"uid": "3"},)]
    df = spark.createDataFrame(rows, "labels map<string,string>")
    out = {r["k"]: r for r in label_cardinality(df).collect()}
    assert out["uid"]["n_values"] == 3 and out["uid"]["n_rows"] == 4
    assert out["uid"]["top_value"] == "3" and out["uid"]["top_count"] == 2
    assert out["os"]["n_values"] == 2 and out["os"]["n_rows"] == 3
    assert out["os"]["top_value"] == "linux" and out["os"]["top_count"] == 2
    # tie on count -> lexicographically larger value wins
    tie = spark.createDataFrame([({"k1": "a"},), ({"k1": "b"},)],
                                "labels map<string,string>")
    t = label_cardinality(tie).collect()[0]
    assert t["top_value"] == "b" and t["top_count"] == 1
