"""Round-13 operator tests: TPC-H Q19 (disjunctive OR-of-AND-blocks
pushdown) and the real PPM P6 image codec (VERDICT r12 #4/#6)."""

import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# TPC-H Q19
# ---------------------------------------------------------------------------

def test_q19_block_fanout_golden(spark):
    """Per-block row counts at sf0.001 (blocks are brand-disjoint, so
    the OR's total is their sum) — pins the fan-out of each AND-block
    so a predicate regression in any one block is visible."""
    import __spark_entry__ as E

    li = E.load_table(spark, SF0001, "lineitem")
    pt = E.load_table(spark, SF0001, "part")
    j = li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
    b1 = ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
          & F.col("l_quantity").between(1, 25)
          & (F.col("l_returnflag") == "N"))
    b2 = ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 35)
          & F.col("l_quantity").between(10, 40)
          & F.col("l_returnflag").isin("N", "A"))
    b3 = ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 50)
          & F.col("l_quantity").between(20, 50))
    counts = j.agg(
        F.sum(b1.cast("long")).alias("b1"),
        F.sum(b2.cast("long")).alias("b2"),
        F.sum(b3.cast("long")).alias("b3"),
    ).collect()[0]
    assert (counts["b1"], counts["b2"], counts["b3"]) == (33, 78, 209)
    out = E.q_tpch_q19_discount_promo(spark, SF0001).collect()[0]
    assert out["n_lines"] == 33 + 78 + 209  # brand-disjoint blocks


def test_q19_disjunction_reaches_both_scans(spark):
    """The Q19 plan contract: Catalyst derives each side's residual
    disjunction and pushes it into that scan's PushedFilters — the
    brand/size OR-of-ANDs on the part scan, the quantity/returnflag
    envelope on the lineitem scan — and the join stays a broadcast
    hash join on partkey with the full OR as its extra condition."""
    import __spark_entry__ as E

    df = E.q_tpch_q19_discount_promo(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # part-side residual: an Or(...) of brand equalities in PushedFilters
    part_scan = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "part.parquet" in ln
    ]
    assert part_scan and "Or(" in part_scan[0].split("PushedFilters:")[1], \
        part_scan
    li_scan = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "lineitem.parquet" in ln
    ]
    assert li_scan and "Or(" in li_scan[0].split("PushedFilters:")[1], li_scan
    # column pruning: the lineitem scan must not read all 11 columns
    assert "l_orderkey" not in li_scan[0].split("ReadSchema:")[1]


# ---------------------------------------------------------------------------
# PPM P6 codec
# ---------------------------------------------------------------------------

def _expected_features(raw: bytes, width: int = 8):
    """Pure-Python reference for attach_ppm_payload + ppm_features."""
    h = len(raw) // (3 * width)
    n = width * h
    px = raw[: 3 * n]
    r = px[0::3]
    g = px[1::3]
    b = px[2::3]
    lum = [2126 * rr + 7152 * gg + 722 * bb for rr, gg, bb in zip(r, g, b)]
    grad = sum(abs(lum[i] - lum[i - 1]) for i in range(1, n))
    return {
        "width": width, "height": h, "n_pixels": n,
        "sum_r": sum(r), "sum_g": sum(g), "sum_b": sum(b),
        "sum_lum": sum(lum), "luma_grad": grad,
    }


def test_ppm_attach_parse_roundtrip(spark):
    from v3io_tsdb_spark.functions.multimodal import (
        attach_ppm_payload,
        ppm_features,
    )

    texts = [
        (0, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJ"),  # 47 B → h=1
        (1, "x" * 24),                                           # exactly 1 row
        (2, "short"),                                            # h=0 → drops
        (3, "µ-multibyte ünïcode text that spans rows " * 3),    # utf-8 >1 byte
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in ppm_features(attach_ppm_payload(df)).collect()}
    assert 2 not in out  # empty-doc rule
    for doc_id, text in texts:
        raw = text.encode("utf-8")
        if len(raw) < 24:
            continue
        want = _expected_features(raw)
        got = out[doc_id]
        assert got["width"] == want["width"]
        assert got["height"] == want["height"]
        assert got["n_pixels"] == want["n_pixels"]
        n = want["n_pixels"]
        assert abs(got["mean_r"] - want["sum_r"] / n) < 1e-9
        assert abs(got["mean_g"] - want["sum_g"] / n) < 1e-9
        assert abs(got["mean_b"] - want["sum_b"] / n) < 1e-9
        assert abs(got["mean_luma"] - want["sum_lum"] / (10000 * n)) < 1e-9
        assert got["luma_grad"] == want["luma_grad"]


def test_ppm_parser_handles_comments_and_whitespace(spark):
    """The parser implements the netpbm header grammar, not just the
    exact byte layout attach_ppm_payload emits."""
    from v3io_tsdb_spark.functions.multimodal import ppm_features

    raster = bytes(range(2 * 1 * 3))  # 2×1 RGB
    payload = b"P6 # a comment\n# another\n  2\t1 # dims\n 255\n" + raster
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id long, payload binary")
    row = ppm_features(df).collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (2, 1, 2)
    lum = [2126 * 0 + 7152 * 1 + 722 * 2, 2126 * 3 + 7152 * 4 + 722 * 5]
    assert row["luma_grad"] == abs(lum[1] - lum[0])


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n2 1\n255\n" + b"\x00" * 6,          # wrong magic
        b"P6\n2 1\n65535\n" + b"\x00" * 12,       # unsupported maxval
        b"P6\n4 4\n255\n" + b"\x00" * 10,         # truncated raster
        b"P6\n2 1",                               # truncated header
        b"P6 # no newline ever",                  # unterminated comment
    ],
)
def test_ppm_parser_rejects_malformed(spark, payload):
    from v3io_tsdb_spark.functions.multimodal import ppm_features

    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    with pytest.raises(Exception):
        ppm_features(df).collect()


def test_ppm_null_payload_drops(spark):
    from v3io_tsdb_spark.functions.multimodal import ppm_features

    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"P6\n1 1\n255\nABC"))],
        "doc_id long, payload binary",
    )
    rows = ppm_features(df).collect()
    assert [r["doc_id"] for r in rows] == [2]
