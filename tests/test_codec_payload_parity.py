"""Byte-equality of the SQL-built codec payloads across engines.

The WAV/PPM/Y4M oracles compute features from the same TEXT bytes the
Spark side encodes, so a silent divergence in the PAYLOAD ASSEMBLY
itself (header fields, size words, frame interleave) would not show up
in the feature hashes. These tests pin the stronger claim each attach_*
docstring makes — "the DuckDB oracle derives the IDENTICAL bytes" — by
building the full payload hex in DuckDB and comparing it to Spark's
`hex(payload)` byte-for-byte over real fixture docs.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"
DOCS = f"{SF0001}/documents.parquet"
# every 7th doc: ~70 real docs spanning short/long/planted-dup texts
SAMPLE = "doc_id % 7 = 0"


def _ascii_hex(s: str) -> str:
    from v3io_tsdb_spark.functions.multimodal import _ascii_hex

    return _ascii_hex(s)


def _spark_payload_hex(spark, attach, **kw):
    df = spark.read.parquet(DOCS).where(SAMPLE.replace("=", "=="))
    out = attach(df, **kw).select("doc_id", F.hex("payload").alias("ph"))
    return {r["doc_id"]: r["ph"] for r in out.collect() if r["ph"] is not None}


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS FROM '{DOCS}'")
    return {r[0]: r[1] for r in con.execute(sql).fetchall() if r[1] is not None}


def _le32(expr: str) -> str:
    p = f"lpad(hex({expr}), 8, '0')"
    return (f"(substr({p}, 7, 2) || substr({p}, 5, 2) || "
            f"substr({p}, 3, 2) || substr({p}, 1, 2))")


def test_wav_payload_bytes_match_duckdb(spark):
    from v3io_tsdb_spark.functions.multimodal import attach_wav_payload

    got = _spark_payload_hex(spark, attach_wav_payload)
    # canonical 44-byte header: every field but the two size words is
    # a constant of (PCM, mono, 16-bit, 8000 Hz)
    want = _duck(f"""
      WITH hb AS (
        SELECT doc_id, hex(encode(text)) AS th FROM documents
        WHERE {SAMPLE}
      ),
      d AS (
        SELECT doc_id, substr(th, 1, 4 * (length(th) // 4)) AS dh,
               (4 * (length(th) // 4)) // 2 AS ds
        FROM hb
      )
      SELECT doc_id,
             '52494646' || {_le32('ds + 36')} || '57415645' ||
             '666D7420' || '10000000' || '0100' || '0100' ||
             '401F0000' || '803E0000' || '0200' || '1000' ||
             '64617461' || {_le32('ds')} || dh AS phex
      FROM d
    """)
    assert got == want and len(got) > 30


def test_ppm_payload_bytes_match_duckdb(spark):
    from v3io_tsdb_spark.functions.multimodal import attach_ppm_payload

    got = _spark_payload_hex(spark, attach_ppm_payload)
    magic = _ascii_hex("P6\n8 ")
    maxval = _ascii_hex("\n255\n")
    want = _duck(f"""
      WITH hb AS (
        SELECT doc_id, hex(encode(text)) AS th,
               (length(hex(encode(text))) // 2) // 24 AS h
        FROM documents WHERE {SAMPLE}
      )
      SELECT doc_id,
             CASE WHEN h >= 1 THEN
               '{magic}' ||
               hex(encode(CAST(h AS VARCHAR))) ||
               '{maxval}' ||
               substr(th, 1, CAST(48 * h AS INT))
             END AS phex
      FROM hb
    """)
    assert got == want and len(got) > 30


def test_y4m_payload_bytes_match_duckdb(spark):
    from v3io_tsdb_spark.functions.multimodal import attach_y4m_payload

    got = _spark_payload_hex(spark, attach_y4m_payload)
    hdr = _ascii_hex("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n")
    marker = _ascii_hex("FRAME\n")
    want = _duck(f"""
      WITH hb AS (
        SELECT doc_id, hex(encode(text)) AS th,
               (length(hex(encode(text))) // 2) // 64 AS nf
        FROM documents WHERE {SAMPLE}
      )
      SELECT doc_id,
             CASE WHEN nf >= 1 THEN
               '{hdr}' || array_to_string(list_transform(
                 range(nf), i -> '{marker}' ||
                   substr(th, CAST(128 * i + 1 AS INT), 128)), '')
             END AS phex
      FROM hb
    """)
    assert got == want and len(got) > 30
