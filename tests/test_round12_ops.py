"""Round-12 goldens: TPC-H Q15 (max-of-aggregate argmax over a derived
revenue view) and Q16 (NOT-IN-filtered dim + count(DISTINCT) rollup),
per VERDICT r11 #5 — fan-out fakes in the X169-X175 style."""

import datetime
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------------- Q15 shape


def _fake_q15_dir(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        # (suppkey, shipdate, extendedprice, discount)
        [
            (1, _ts("1996-02-01"), 10.0, 0.0),   # s1 in-window: 10
            (1, _ts("1996-03-01"), 5.0, 0.5),    # s1 in-window: +2.5
            (2, _ts("1996-01-15"), 12.5, 0.0),   # s2: 12.5 — exact tie
            (3, _ts("1995-12-31"), 100.0, 0.0),  # before the window
            (3, _ts("1996-04-01"), 100.0, 0.0),  # at the exclusive end
            (3, _ts("1996-02-20"), 1.0, 0.0),    # s3 in-window: 1
        ],
        "l_suppkey long, l_shipdate timestamp_ntz, "
        "l_extendedprice double, l_discount double",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(i, f"S{i}") for i in (1, 2, 3)], "s_suppkey long, s_name string"
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    return d


def test_q15_argmax_tie_returns_all_achievers(tmp_path, spark):
    """s1's 10 + 2.5 and s2's 12.5 are the SAME exact decimal — both
    argmax suppliers emit; s3's out-of-window lines never count and
    the window end is exclusive."""
    import __spark_entry__ as E

    d = _fake_q15_dir(spark, tmp_path)
    out = sorted(
        E.queries()["tpch_q15_top_supplier"](spark, d).collect(),
        key=lambda r: r["s_suppkey"],
    )
    assert [(r["s_suppkey"], r["s_name"], r["total_revenue"]) for r in out] \
        == [(1, "S1", 12.5), (2, "S2", 12.5)]


def test_q15_plan_single_fact_scan_broadcast_dim(spark):
    """The revenue view is checkpointed (one fact scan feeds both the
    max and the equality filter) and the supplier dim joins broadcast
    — no SortMergeJoin anywhere."""
    import __spark_entry__ as E

    df = E.queries()["tpch_q15_top_supplier"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:800]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ------------------------------------------------------- Q16 shape


def _fake_q16_dir(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        # kept / brand-excluded / type-prefix-excluded / size-excluded
        [
            (1, "Brand#1", "ECONOMY", 4),
            (2, "Brand#5", "ECONOMY", 4),
            (3, "Brand#1", "MEDIUM", 4),
            (4, "Brand#1", "ECONOMY", 7),
        ],
        "p_partkey long, p_brand string, p_type string, p_size int",
    ).write.parquet(os.path.join(d, "part.parquet"))
    spark.createDataFrame(
        [(1, "S1", 10.0), (2, "S2", -5.0), (3, "S3", 0.0)],
        "s_suppkey long, s_name string, s_acctbal double",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    spark.createDataFrame(
        # (partkey, suppkey): dup pair, blacklisted supplier, second
        # supplier, and pairs on every excluded part
        [(1, 1), (1, 1), (1, 2), (1, 3), (2, 1), (3, 1), (4, 1)],
        "l_partkey long, l_suppkey long",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_q16_excludes_and_distinct_counts(tmp_path, spark):
    """Only part 1 survives the brand/type/size predicates; its
    suppliers are {s1 (dup pairs count once), s3} — s2 is blacklisted
    (acctbal < 0) by the anti-join."""
    import __spark_entry__ as E

    d = _fake_q16_dir(spark, tmp_path)
    out = E.queries()["tpch_q16_supplier_cnt"](spark, d).collect()
    assert [(r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
            for r in out] == [("Brand#1", "ECONOMY", 4, 2)]


def test_q16_plan_broadcast_dim_and_left_anti(spark):
    """Dimension predicates prune via a broadcast join, the blacklist
    is a broadcast LeftAnti, and the fact is never sort-merge-joined."""
    import __spark_entry__ as E

    df = E.queries()["tpch_q16_supplier_cnt"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:800]
    assert "LeftAnti" in plan, plan[:800]
    assert "BroadcastHashJoin" in plan, plan[:800]


# ------------------------------------------------- WAV real decode


def _wav_bytes(samples, rate=8000, extra_chunk=False):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    chunks = b""
    if extra_chunk:
        # odd-sized LIST chunk + pad byte: exercises the word-aligned
        # RIFF walk, not just the canonical fixed-offset layout
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + fmt + chunks + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_features_hand_golden(spark):
    """Hand-packed PCM [100, -200, 0, 300]: peak 300, mean_abs 150,
    rms sqrt(35000) at 6dp, 2 sign flips (0 counts positive)."""
    from v3io_tsdb_spark.functions.multimodal import wav_features

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes([100, -200, 0, 300])))],
        "doc_id long, payload binary",
    )
    r = wav_features(df).collect()[0]
    assert (r["n_samples"], r["sample_rate"], r["peak"]) == (4, 8000, 300)
    assert r["mean_abs"] == 150.0
    assert r["rms"] == 187.082869  # round6(sqrt(35000))
    assert r["zero_crossings"] == 2


def test_wav_features_walks_riff_chunks(spark):
    """A non-canonical layout (odd-sized LIST chunk before data) parses
    identically — the decoder walks chunks, it doesn't assume byte 44."""
    from v3io_tsdb_spark.functions.multimodal import wav_features

    df = spark.createDataFrame(
        [(7, bytearray(_wav_bytes([5, -5], extra_chunk=True)))],
        "doc_id long, payload binary",
    )
    r = wav_features(df).collect()[0]
    assert (r["doc_id"], r["n_samples"], r["peak"], r["zero_crossings"]) \
        == (7, 2, 5, 1)


def test_wav_features_rejects_garbage(spark):
    """A payload without the RIFF/WAVE magic raises, loudly."""
    import pytest as _pytest

    from v3io_tsdb_spark.functions.multimodal import wav_features

    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav file at all"))],
        "doc_id long, payload binary",
    )
    with _pytest.raises(Exception, match="RIFF|WAVE"):
        wav_features(df).collect()


def test_attach_wav_payload_is_valid_wav(spark):
    """The SQL-expression-built payload is a byte-exact canonical WAV:
    python's struct parse of it recovers the text bytes as samples."""
    import struct

    from v3io_tsdb_spark.functions.multimodal import attach_wav_payload

    df = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    payload = bytes(attach_wav_payload(df).collect()[0]["payload"])
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    assert payload[36:40] == b"data"
    assert struct.unpack_from("<I", payload, 40)[0] == 4
    assert payload[44:] == b"abcd"  # 2 int16 samples = the text bytes


def test_stream_wav_matches_batch(tmp_path, spark):
    """The streaming decode is stateless mapInPandas: its features are
    byte-identical to the batch parse of the same payloads."""
    import __spark_entry__ as E
    from v3io_tsdb_spark.functions.multimodal import wav_features

    src = os.path.join(str(tmp_path), "in")
    payloads = [
        (1, bytearray(_wav_bytes([100, -200, 0, 300]))),
        (2, bytearray(_wav_bytes([7, 7, -7]))),
    ]
    spark.createDataFrame(
        payloads, "doc_id long, payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema("doc_id long, payload binary").parquet(src)
    out = E._run_available_now(wav_features(raw))
    batch = wav_features(spark.read.parquet(src))
    key = lambda r: r["doc_id"]
    assert sorted(out.collect(), key=key) == sorted(batch.collect(), key=key)


# ------------------------------------- semantic decontamination


def test_semantic_decontaminate_contract(spark):
    """Identical vectors share a signature, so an exact eval copy is
    ALWAYS found (any radius); two identical eval matches tie at
    cosine 1.0 and the argmax falls to the LOWER eval id; orthogonal
    vectors stay below threshold and produce no verdict."""
    from v3io_tsdb_spark.functions.dedup import semantic_decontaminate

    e1 = [1.0, 0.0, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [(1, e1), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(10, e1), (11, e1), (12, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_decontaminate(
        corpus, ev, threshold=0.9, n_planes=4, dim=4, probe_radius=1
    ).collect()}
    assert set(out) == {1}
    assert out[1]["n_matches"] == 2
    assert out[1]["best_eval_id"] == 10  # tie at 1.0 -> lowest eval id
    assert out[1]["best_cosine"] == 1.0


def test_semantic_decontaminate_multiprobe_widens_recall(spark):
    """On the sf0.001 fixture, radius-2 probing finds at least as many
    contaminated items as exact-signature blocking (radius 0), and
    every radius-0 verdict survives at radius 2 (probes are a strict
    superset)."""
    from v3io_tsdb_spark.functions.dedup import semantic_decontaminate

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ev = emb.where(F.col("vec_id") % 10 == 3)
    corpus = emb.where(F.col("vec_id") % 10 != 3)

    def run(r):
        return {row["vec_id"] for row in semantic_decontaminate(
            corpus, ev, threshold=0.3, n_planes=6, dim=64, probe_radius=r
        ).collect()}

    r0, r2 = run(0), run(2)
    assert r0 <= r2
    assert len(r2) >= len(r0)


# ------------------------------- streaming session perplexity (X181)


def test_stream_session_perplexity_cross_batch(tmp_path, spark):
    """Model-serving twin: the pre-quantized integer model scores the
    stream; a session stays OPEN in state across micro-batches and
    emits only when a later event opens a gap — with the exact batch
    mean (integer micro-nat sum / (1e6 * n))."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_session_perplexity

    GAP = 1_800_000
    model = {("x", "y"): -693_147, ("y", "x"): -1_203_973}
    in_dir = tmp_path / "sp_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "sp_ckpt")
    (in_dir / "b1.json").write_text(
        "\n".join(json.dumps(d) for d in [
            {"ts": 0, "user_id": 7, "event_type": "x", "event_id": 1},
            {"ts": 100, "user_id": 7, "event_type": "y", "event_id": 2},
        ])
    )
    raw = spark.readStream.schema(
        "ts long, user_id long, event_type string, event_id long"
    ).json(str(in_dir))
    q = (
        stream_session_perplexity(raw, model, gap_ms=GAP)
        .writeStream.format("memory").queryName("sp_xb")
        .outputMode("append").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from sp_xb").count() == 0  # still open
        (in_dir / "b2.json").write_text(
            "\n".join(json.dumps(d) for d in [
                # same session continues (within gap), then a gap closes it
                {"ts": 200, "user_id": 7, "event_type": "x", "event_id": 3},
                {"ts": 200 + GAP + 1, "user_id": 7,
                 "event_type": "x", "event_id": 4},
            ])
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from sp_xb").collect()
    assert len(out) == 1
    r = out[0]
    # session 1: x->y (-693147) + y->x (-1203973) over 2 steps
    want = round((-693_147 - 1_203_973) / (1e6 * 2) + 1e-9, 6)
    assert (r["user_id"], r["sess"], r["n_steps"]) == (7, 1, 2)
    assert abs(r["mean_logp"] - want) < 1e-12


def test_wav_features_rejects_truncated_chunk(spark):
    """A data chunk whose declared size overruns the payload raises —
    no features from a silent partial decode."""
    import pytest as _pytest

    from v3io_tsdb_spark.functions.multimodal import wav_features

    blob = _wav_bytes([1, 2, 3, 4])[:-4]  # cut the last two samples
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )
    with _pytest.raises(Exception, match="truncated"):
        wav_features(df).collect()


def test_stream_session_perplexity_skips_unseen_transition(tmp_path, spark):
    """A transition absent from the training model contributes to
    neither n_steps nor the sum (the batch inner-join rule) — and
    never crashes the query."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_session_perplexity

    GAP = 1_800_000
    model = {("x", "y"): -1_000_000}  # (y, z) deliberately unseen
    in_dir = tmp_path / "spu_in"
    in_dir.mkdir()
    (in_dir / "b1.json").write_text(
        "\n".join(json.dumps(d) for d in [
            {"ts": 0, "user_id": 1, "event_type": "x", "event_id": 1},
            {"ts": 1, "user_id": 1, "event_type": "y", "event_id": 2},
            {"ts": 2, "user_id": 1, "event_type": "z", "event_id": 3},
            {"ts": 2 + GAP + 1, "user_id": 1,
             "event_type": "x", "event_id": 4},
        ])
    )
    raw = spark.readStream.schema(
        "ts long, user_id long, event_type string, event_id long"
    ).json(str(in_dir))
    q = (
        stream_session_perplexity(raw, model, gap_ms=GAP)
        .writeStream.format("memory").queryName("spu_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "spu_ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from spu_out").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_steps"], r["mean_logp"]) == (1, -1.0)  # y->z skipped


def test_stream_session_perplexity_rejects_string_ids(spark):
    import pytest as _pytest

    from v3io_tsdb_spark.streaming.stateful import stream_session_perplexity

    df = spark.readStream.format("rate").load().selectExpr(
        "timestamp as ts", "CAST(value AS STRING) AS user_id",
        "'x' AS event_type", "value AS event_id"
    )
    with _pytest.raises(TypeError, match="integral user column"):
        stream_session_perplexity(df, {})
