"""Round-13 wave 2: the four remaining distinct public TPC-H plan
patterns (VERDICT r12 missing-#2) — Q7 (two-dim symmetric nation-pair
disjunction), Q8 (conditional-sum market share over the widest
snowflake), Q9 (cross-table measure with a non-pushable contains
filter), Q14 (single-row conditional-aggregate ratio) — plus the
stream-matches-batch pin that lets `stream_value_heatmap` retire to
pytest-only status (registry held at 200)."""

import os

import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"
DAY = 86_400_000


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str, table: str):
    return [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and f"{table}.parquet" in ln
    ]


# ------------------------------------------------------------- Q7


def test_q7_golden_sf0001(spark):
    """sf0.001 has only the NATION_3→NATION_7 direction inside the
    1996-1997 band: two years, two lines each, exact DECIMAL revenue."""
    import __spark_entry__ as E

    rows = sorted(
        E.q_tpch_q7_volume_shipping(spark, SF0001).collect(),
        key=lambda r: r["l_year"],
    )
    assert [
        (r["supp_nation"], r["cust_nation"], r["l_year"], r["n_lines"])
        for r in rows
    ] == [
        ("NATION_3", "NATION_7", 1996, 2),
        ("NATION_3", "NATION_7", 1997, 2),
    ]
    assert rows[0]["revenue"] == 137444.2596
    assert rows[1]["revenue"] == 114305.5872


def test_q7_plan_pushes_shipdate_and_residual_pair_filters(spark):
    """The shipdate band pushes to the fact scan; the nation-PAIR
    disjunction spans two independent dims so the FULL predicate only
    runs post-join, but Catalyst derives each side's residual
    `n_name IN (A, B)` and pushes it into BOTH nation scans (the
    two-dim analog of Q19's one-join residual derivation) — assert
    the Or(EqualTo, EqualTo) landed in each nation scan."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_tpch_q7_volume_shipping(spark, SF0001))
    li = _scan_lines(plan, "lineitem")
    assert li and "l_shipdate" in li[0].split("PushedFilters:")[1], li
    assert "BroadcastHashJoin" in plan
    n_scans = _scan_lines(plan, "nation")
    assert len(n_scans) == 2  # supplier-side and customer-side lookups
    for ln in n_scans:
        pushed = ln.split("PushedFilters:")[1]
        assert "NATION_3" in pushed and "NATION_7" in pushed, ln
        assert "Or(" in pushed, ln


# ------------------------------------------------------------- Q8


def test_q8_golden_sf0001(spark):
    """Numerator and denominator come out of ONE aggregate: exact
    decimal volumes, IEEE-division share (no libm term)."""
    import __spark_entry__ as E

    rows = sorted(
        E.q_tpch_q8_market_share(spark, SF0001).collect(),
        key=lambda r: r["o_year"],
    )
    assert [(r["o_year"], r["n_lines"]) for r in rows] == [(1996, 32), (1997, 24)]
    assert rows[0]["nation_volume"] == 254280.575
    assert rows[0]["total_volume"] == 1525815.7816
    assert rows[0]["mkt_share"] == 0.166652
    assert rows[1]["nation_volume"] == 105197.776
    assert rows[1]["total_volume"] == 1236735.1071
    assert rows[1]["mkt_share"] == 0.085061


def test_q8_plan_pushes_type_and_daterange(spark):
    """p_type pushes to the part scan, the orderdate band to the
    orders scan, and the region filter to the region scan — the three
    selective predicates all prune scan-side before any join."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_tpch_q8_market_share(spark, SF0001))
    pt = _scan_lines(plan, "part")
    assert pt and "STANDARD" in pt[0].split("PushedFilters:")[1], pt
    o = _scan_lines(plan, "orders")
    assert o and "o_orderdate" in o[0].split("PushedFilters:")[1], o
    r = _scan_lines(plan, "region")
    assert r and "AMERICA" in r[0].split("PushedFilters:")[1], r
    # one fact pass: exactly one lineitem scan feeds both sums
    assert len(_scan_lines(plan, "lineitem")) == 1


# ------------------------------------------------------------- Q9


def test_q9_golden_sf0001(spark):
    """70 (nation, year) groups over the '%red%' part family; the
    cross-table profit term sums exactly in DECIMAL."""
    import __spark_entry__ as E

    rows = E.q_tpch_q9_product_profit(spark, SF0001).collect()
    assert len(rows) == 70
    assert sum(r["n_lines"] for r in rows) == 799
    assert round(sum(r["profit"] for r in rows), 4) == 22815707.8223


def test_q9_contains_pushes_to_part_scan(spark):
    """The registry's only non-anchored LIKE on a dim: Spark's parquet
    source DOES accept StringContains into PushedFilters (row-group
    dictionary/stats screening) — assert it reached the part scan, so
    the dim never leaves the scan unfiltered."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_tpch_q9_product_profit(spark, SF0001))
    pt = _scan_lines(plan, "part")
    assert pt and "StringContains(p_name,red)" in pt[0].split(
        "PushedFilters:")[1], pt
    # pruning: the part scan reads only the two needed columns
    assert "p_brand" not in pt[0].split("ReadSchema:")[1]


# ------------------------------------------------------------ Q14


def test_q14_golden_sf0001(spark):
    import __spark_entry__ as E

    row = E.q_tpch_q14_promo_share(spark, SF0001).collect()[0]
    assert row["n_lines"] == 72
    assert row["promo_revenue"] == 938921.1899
    assert row["total_revenue"] == 3676567.0234
    # 25.537986 is the true half-up 6dp value: the r14 EPS4→EPS6 fix
    # (ADVICE r13 #3) removed the 1e-7 nudge that had bumped the 6th
    # decimal to ...987; the DuckDB oracle agrees under the same EPS6
    assert row["promo_share"] == 25.537986


def test_q14_plan_single_fact_pass_no_extra_exchange(spark):
    """One month-pruned fact scan, a broadcast part join, then the
    single-row aggregate: no hash-partitioned exchange anywhere (the
    only Exchange is the final SinglePartition gather) and no Window."""
    import __spark_entry__ as E

    plan = _executed_plan(E.q_tpch_q14_promo_share(spark, SF0001))
    li = _scan_lines(plan, "lineitem")
    assert li and "l_shipdate" in li[0].split("PushedFilters:")[1], li
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------- Y4M video codec


def _y4m_ref(doc_id, text, w=8, h=8):
    """Pure-Python reference for attach_y4m_payload + y4m_features."""
    import numpy as np

    data = text.encode()
    fb = w * h
    n = len(data) // fb
    if n < 1:
        return None
    arr = (
        __import__("numpy").frombuffer(data[: n * fb], dtype="uint8")
        .astype("int64").reshape(n, fb)
    )
    return {
        "doc_id": doc_id, "width": w, "height": h, "n_frames": n,
        "fps_num": 25, "fps_den": 1,
        "mean_luma": round(int(arr.sum()) / arr.size + 1e-9, 6),
        "luma_min": int(arr.min()), "luma_max": int(arr.max()),
        "temporal_motion":
            int(np.abs(arr[1:] - arr[:-1]).sum()) if n > 1 else 0,
        "intra_grad": int(np.abs(np.diff(arr, axis=1)).sum()),
    }


def test_y4m_roundtrip_matches_reference(spark):
    """SQL-built payloads through the real demuxer equal the
    pure-Python byte math; sub-frame docs drop out (NULL payload)."""
    from v3io_tsdb_spark.functions.multimodal import (
        attach_y4m_payload, y4m_features,
    )

    texts = [
        (1, "motion test " + "".join(chr(33 + (i * 11) % 90)
                                     for i in range(180))),
        (2, "short"),                 # < 64 bytes -> NULL, drops out
        (3, "A" * 64),                # one flat frame: zero gradients
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in y4m_features(attach_y4m_payload(df)).collect()}
    assert set(out) == {1, 3}
    for i, t in texts:
        ref = _y4m_ref(i, t)
        if ref is not None:
            assert out[i] == ref, (out[i], ref)
    assert out[3]["temporal_motion"] == 0 and out[3]["intra_grad"] == 0


def test_y4m_payload_is_real_container(spark):
    """The assembled bytes ARE a yuv4mpeg stream: stream header line,
    then FRAME markers every (6 + w*h) bytes."""
    from v3io_tsdb_spark.functions.multimodal import attach_y4m_payload

    df = spark.createDataFrame(
        [(1, "B" * 130)], "doc_id long, text string"
    )
    p = bytes(attach_y4m_payload(df).collect()[0]["payload"])
    hdr, body = p.split(b"\n", 1)
    assert hdr == b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono"
    assert body[:6] == b"FRAME\n" and body[70:76] == b"FRAME\n"
    assert len(body) == 2 * 70  # two frames of marker + 64 luma bytes


def test_y4m_header_grammar_and_malformed_raise(spark):
    """Demuxer contract: I/A/X tags tolerated, unknown tags, non-mono
    colorspaces (incl. the 420 default when C is absent), truncated
    frames, and missing markers all raise — never silent partials."""
    import pytest as _pytest

    from v3io_tsdb_spark.functions.multimodal import y4m_features

    def run(payload: bytes):
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        return y4m_features(df).collect()

    frame = b"FRAME\n" + bytes(range(64))
    # tolerated tags parse; X extension ignored
    ok = run(b"YUV4MPEG2 W8 H8 F30:1 Ip A1:1 Cmono XCOLORRANGE=FULL\n"
             + frame)
    assert ok[0]["fps_num"] == 30 and ok[0]["n_frames"] == 1
    for bad in (
        b"YUV4MPEG2 W8 H8 F25:1 Q9 Cmono\n" + frame,   # unknown tag
        b"YUV4MPEG2 W8 H8 F25:1\n" + frame,            # C420 default
        b"YUV4MPEG2 W8 H8 F25:1 C420jpeg\n" + frame,   # chroma planes
        b"YUV4MPEG2 W8 F25:1 Cmono\n" + frame,         # missing H
        b"YUV4MPEG2 W8 H8 F25:1 Cmono\n" + frame[:40], # truncated
        b"YUV4MPEG2 W8 H8 F25:1 Cmono\nFRAMX\n" + bytes(64),  # marker
        # spec requires '\n' or ' ' right after FRAME — a glued
        # parameter-less junk header must raise, not parse as a frame
        b"YUV4MPEG2 W8 H8 F25:1 Cmono\nFRAMExyz\n" + bytes(64),
        b"RIFF not a y4m stream\n" + frame,            # wrong magic
    ):
        with _pytest.raises(Exception):
            run(bad)


# ------------------------- stream_value_heatmap retirement pin


def test_stream_value_heatmap_matches_batch_cells(tmp_path, spark):
    """Retirement contract (registry held at 200): the complete-mode
    streaming heatmap folds micro-batch partial cells into state
    exactly like batch folds partition partials — cell-for-cell equal
    counts even when the input arrives split across micro-batches
    (maxFilesPerTrigger=1 over 3 files)."""
    from v3io_tsdb_spark.functions.histogram import value_heatmap

    rows = [
        (d * DAY + i * 1000, name, float(v))
        for d in range(3)
        for i, (name, v) in enumerate(
            [("a", 5.0), ("a", 25.0), ("a", 25.5), ("b", -1.0),
             ("b", 39.9), ("a", 41.0)]
        )
    ]
    src = os.path.join(str(tmp_path), "in")
    df = spark.createDataFrame(rows, "ts long, name string, value double")
    df.repartition(3).write.mode("overwrite").parquet(src)

    batch = {
        (r["name"], r["t"], r["bucket_lo"]): r["n"]
        for r in value_heatmap(
            spark.read.parquet(src), "value", 20.0, ts_col="ts",
            step_ms=DAY, origin_ms=0, group_cols=("name",),
        ).collect()
    }
    assert batch[("b", 0, -20.0)] == 1  # negatives floor DOWN
    assert batch[("a", DAY, 20.0)] == 2  # 25.0 and 25.5 share a cell

    raw = (
        spark.readStream.schema("ts long, name string, value double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    hm = value_heatmap(
        raw, "value", 20.0, ts_col="ts", step_ms=DAY, origin_ms=0,
        group_cols=("name",),
    )
    q = (
        hm.writeStream.format("memory").queryName("hm13_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream = {
        (r["name"], r["t"], r["bucket_lo"]): r["n"]
        for r in spark.sql("select * from hm13_out").collect()
    }
    assert stream == batch
