"""Round-14 operator tests: the six X189–X194 net-new rows — TPC-H
Q10 (completes 22/22), exact-integer PageRank, simplified silhouette,
label-coherence outliers, LSH precision calibration, and VAD-style
audio segmentation — plus the pytest-only norm_outliers primitive.

Oracle parity for all six registered rows is carried by the local
sweep (tools/check_oracle.py) and the order/ulp sweep; these tests pin
plan shapes, hand-computed goldens, and engine-unit behaviors the
sweeps can't see (malformed input, synthetic outlier injection)."""

import pytest
from pyspark.sql import functions as F

from tests.test_round12_ops import _wav_bytes

SF0001 = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str, table: str):
    return [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and f"{table}.parquet" in ln
    ]


# ------------------------------------------------------------- Q10


def test_q10_golden_sf0001(spark):
    import __spark_entry__ as E

    rows = E.q_tpch_q10_returned_items(spark, SF0001).collect()
    assert len(rows) == 20
    # revenue strictly ordered desc with custkey tiebreak
    rv = [(r["revenue"], r["c_custkey"]) for r in rows]
    assert rv == sorted(rv, key=lambda t: (-t[0], t[1]))
    assert rows[0]["revenue"] > rows[19]["revenue"]


def test_q10_plan_pushdown_and_broadcast_dims(spark):
    """returnflag pushes to the fact scan, the quarter window to the
    orders scan; customer and nation come in as broadcast joins; the
    top-20 is TakeOrdered (per-partition heaps), never a global sort."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_tpch_q10_returned_items(spark, SF0001))
    li = _scan_lines(plan, "lineitem")
    assert li and "EqualTo(l_returnflag,R)" in li[0].split(
        "PushedFilters:")[1], li
    o = _scan_lines(plan, "orders")
    assert o and "o_orderdate" in o[0].split("PushedFilters:")[1], o
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


# -------------------------------------------------------- PageRank


def test_pagerank_golden_sf0001(spark):
    """Pinned 5-state ranks at sf0.001 — the exact-integer program
    admits exactly one answer, so the golden is bit-stable."""
    import __spark_entry__ as E

    rows = {r["state"]: (r["pr"], r["rank"])
            for r in E.q_events_pagerank(spark, SF0001).collect()}
    assert rows == {
        "click": (0.243733, 1),
        "view": (0.206134, 2),
        "purchase": (0.185842, 3),
        "signup": (0.183779, 4),
        "error": (0.180509, 5),
    }


def test_pagerank_mass_and_teleport_floor(spark):
    """Damped-walk invariants: total mass stays in (0.9, 1.0] (the
    dangling leak can only shrink it) and every state keeps at least
    the teleport floor (1-d)/N = 3/(20*5) = 0.03."""
    import __spark_entry__ as E

    rows = E.q_events_pagerank(spark, SF0001).collect()
    total = sum(r["pr"] for r in rows)
    assert 0.9 < total <= 1.0 + 1e-9
    assert all(r["pr"] >= 3 / (20 * len(rows)) - 1e-9 for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_pagerank_dangling_state_keeps_teleport_rank(spark):
    """A sink state (no outgoing edges) forwards nothing but still
    receives teleport every step — hand-built 2-state chain a->b:
    b's matrix row is empty, so after the first step a holds only
    teleport and b gets teleport + a's forwarded mass. (Takes the
    spark fixture — getActiveSession() is None under `pytest -k`
    isolation, ADVICE r14 #3.)"""
    from v3io_tsdb_spark.operators.paths import pagerank
    trans = spark.createDataFrame(
        [("a", "b", 1, 1_000_000)],
        "from_state string, to_state string, c long, p6 long",
    )
    rows = {r["state"]: r["pr"] for r in pagerank(trans, k=3).collect()}
    # teleport floor (1-d)/N = 3/40 = 0.075; a receives ONLY teleport
    # after step 1 (nothing points at it)
    assert rows["a"] == 0.075
    assert rows["b"] > rows["a"]


def test_pagerank_plan_matrix_materialized_once(spark):
    """The |states|²-bounded matrix is checkpointed before the k
    iterations: without it every iteration replays the data-sized
    sessionize windows (r14 plan audit measured 50 exchanges / 57
    window ops for k=5; with the checkpoint the final plan keeps only
    the panel joins and the single rank window)."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_events_pagerank(spark, SF0001))
    assert plan.count("Window") <= 2, plan.count("Window")
    assert plan.count("Exchange hashpartitioning") <= 12
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------ Silhouette


def test_silhouette_matches_kmeans_membership(spark):
    """The silhouette reuses the trained panel, so its per-cluster
    sizes must equal kmeans_lloyd's — and the squared-distance
    simplified s = 1 - a/b lives in [0, 1] (b >= a by argmin)."""
    import __spark_entry__ as E
    from v3io_tsdb_spark.functions.similarity import kmeans_lloyd

    emb = E.load_table(spark, SF0001, "embeddings")
    sil = {r["centroid_id"]: r for r in
           E.q_emb_silhouette(spark, SF0001).collect()}
    prof = {r["centroid_id"]: r["n_vecs"]
            for r in kmeans_lloyd(emb, k=4, n_iter=3).collect()}
    assert {c: r["n_vecs"] for c, r in sil.items()} == prof
    for r in sil.values():
        assert 0.0 <= r["mean_sil"] <= 1.0
        assert r["mean_a"] >= 0.0


def test_silhouette_separated_clusters_score_high(spark):
    """Two tight, far-apart blobs: a >> b never happens, so the mean
    simplified silhouette per cluster is close to 1."""
    from v3io_tsdb_spark.functions.similarity import kmeans_silhouette

    # ids alternate blobs so the two lowest-id seeds start one per
    # blob (id 0 -> blob A, id 1 -> blob B) and Lloyd converges
    rows = [(i, [0.0 + 0.01 * (i % 3), 0.0]) for i in range(0, 12, 2)] + \
           [(i, [100.0 + 0.01 * (i % 3), 0.0]) for i in range(1, 12, 2)]
    df = (kmeans_silhouette(
        _mkdf(rows), k=2, n_iter=2))
    out = df.collect()
    assert len(out) == 2
    for r in out:
        assert r["mean_sil"] > 0.99


def _mkdf(rows):
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession().createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


# ------------------------------------------------- Label coherence


def test_label_coherence_flags_planted_outlier(spark):
    """Five vectors near +x and one antipodal vector under the SAME
    label: the antipode's cosine-to-centroid sits far below the mean,
    so it is the single flagged outlier; a clean second label flags
    none."""
    from v3io_tsdb_spark.functions.similarity import label_coherence

    rows = [(i, 0, [1.0, 0.01 * i]) for i in range(5)]
    rows.append((5, 0, [-1.0, 0.0]))
    rows += [(10 + i, 1, [0.0, 1.0 + 0.001 * i]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r["label"]: r for r in label_coherence(df).collect()}
    assert out[0]["n_outliers"] == 1
    assert out[1]["n_outliers"] == 0
    assert out[0]["n_vecs"] == 6 and out[1]["n_vecs"] == 4
    assert out[1]["mean_cos"] == pytest.approx(1.0, abs=1e-6)
    assert out[1]["var_cos"] == pytest.approx(0.0, abs=1e-9)


def test_label_coherence_plan_broadcast_only(spark):
    """The centroid panel and both stats panels are label-sized —
    every join must broadcast; the data never sort-merge-shuffles."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_emb_label_coherence(spark, SF0001))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_norm_outliers_flags_blown_up_vector(spark):
    """The pytest-only raw-shard screen (the fixture's unit-norm
    embeddings make it degenerate there — label_coherence is the
    registered row): one 10x-norm vector in a unit-norm group is the
    single two-sided z>2 outlier."""
    from v3io_tsdb_spark.functions.similarity import norm_outliers

    rows = [(i, 0, [1.0, 0.0]) for i in range(9)] + [(9, 0, [10.0, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = norm_outliers(df).collect()[0]
    assert out["n_vecs"] == 10
    assert out["n_outliers"] == 1
    # mean of norms [1.0]*9 + [10.0] = 1.9; population std = 2.7
    assert out["mean_norm"] == pytest.approx(1.9, abs=1e-4)
    assert out["std_norm"] == pytest.approx(2.7, abs=1e-4)


# ---------------------------------------------------- LSH precision


def test_lsh_precision_duplicate_docs_hit_top_bucket(spark):
    """Exact duplicate texts share every minhash -> bucket 10 with
    exact jaccard 1.0; a unique filler doc produces no pair."""
    from v3io_tsdb_spark.functions.dedup import minhash_precision_buckets

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    out = {r["est_bucket"]: r for r in
           minhash_precision_buckets(df).collect()}
    assert set(out) == {10}
    assert out[10]["n_pairs"] == 1
    assert out[10]["n_true"] == 1
    assert out[10]["precision"] == 1.0
    assert out[10]["mean_jaccard"] == 1.0


def test_lsh_precision_fixture_invariants(spark):
    """On the real corpus: buckets in [0, 10], counts consistent, and
    the precision column is exactly q6(n_true/n_pairs)."""
    import __spark_entry__ as E
    from v3io_tsdb_spark.functions.detmath import q6_ratio_py

    rows = E.q_doc_lsh_precision(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["est_bucket"] <= 10
        assert 0 <= r["n_true"] <= r["n_pairs"]
        assert r["precision"] == q6_ratio_py(r["n_true"], r["n_pairs"]) / 1e6


# ------------------------------------------------- Audio segments


def test_audio_segments_hand_golden(spark):
    """Two loud frames around a quiet middle: mean-energy gate marks
    frames [loud, quiet, loud] -> 2 segments, longest run 1, first
    active 0. frame_len=2 keeps the fixture hand-checkable."""
    from v3io_tsdb_spark.functions.multimodal import audio_segments

    samples = [1000, 1000, 1, 1, 1000, 1000]  # 3 frames of 2
    df = spark.createDataFrame(
        [(7, bytearray(_wav_bytes(samples)))],
        "doc_id long, payload binary",
    )
    out = audio_segments(df, frame_len=2).collect()[0]
    assert out["n_frames"] == 3
    assert out["n_active"] == 2
    assert out["n_segments"] == 2
    assert out["longest_run"] == 1
    assert out["first_active"] == 0


def test_audio_segments_all_equal_frames_all_active(spark):
    """Equal energies: nf*E == sum(E) for every frame, so the >= gate
    marks all frames active — one segment spanning the file."""
    from v3io_tsdb_spark.functions.multimodal import audio_segments

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes([500] * 8)))],
        "doc_id long, payload binary",
    )
    out = audio_segments(df, frame_len=2).collect()[0]
    assert out["n_frames"] == 4
    assert out["n_active"] == 4
    assert out["n_segments"] == 1
    assert out["longest_run"] == 4


def test_audio_segments_malformed_raises(spark):
    """The module contract: a truncated RIFF chunk raises, never a
    silent partial decode."""
    from v3io_tsdb_spark.functions.multimodal import audio_segments

    good = _wav_bytes([100, 200, 300, 400])
    df = spark.createDataFrame(
        [(1, bytearray(good[:-3]))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated RIFF chunk"):
        audio_segments(df, frame_len=2).collect()


def test_audio_segments_fixture_invariants(spark):
    """Registered-row invariants on the real corpus: the peak-energy
    frame always clears the mean gate, so every file has >= 1 active
    frame and a valid first_active."""
    import __spark_entry__ as E

    rows = E.q_mm_audio_segments(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_active"] <= r["n_frames"]
        assert 1 <= r["n_segments"] <= r["n_active"]
        assert r["longest_run"] <= r["n_active"]
        assert 0 <= r["first_active"] < r["n_frames"]
