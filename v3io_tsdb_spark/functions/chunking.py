"""Token-window operators: corpus-wide exact span dedup and
fixed-size token chunking.

Both operate on whitespace tokens as pure built-in column expressions
(``transform`` / ``sequence`` / ``slice`` — no explode until the row
set is the deliverable, no Python UDFs), so they stay inside
whole-stage codegen and reproduce exactly in ANSI SQL for the oracle.

- ``dup_span_stats`` is the paragraph/line-level exact-dedup analog
  (CCNet-style duplicated-span accounting) for corpora whose documents
  have no line structure: every n-token span is fingerprinted and a
  span is "duplicated" when its text occurs in >= 2 distinct documents.
- ``token_chunks`` is the training-loader chunker: deterministic
  fixed-size windows with stride overlap, one output row per chunk.

Scale notes (100 TB): span fingerprints aggregate by hash — map-side
combinable, bounded per-key state (a count-distinct over doc ids), and
the join back to positions is an equi-join on the same hash, so the
plan is two shuffles on a well-distributed md5 key with no fan-out
joins. Chunking is scan-side row expansion only (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions.text import tokens_col


def _span_hashes(n: int):
    """Array of xxhash64 keys, one per n-token span of ``_toks``.

    The span key is INTERNAL — every consumer reduces it to per-doc
    counts (distinctness is all that matters), so the cheap JVM
    xxhash64 replaces md5 (the md5 of every span position dominated
    dup_span_stats' scan stage). Exposed content hashes (token_chunks'
    chunk_hash) stay md5 for oracle parity.
    """
    toks = F.col("_toks")
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")),
    )


def dup_span_stats(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span accounting.

    Returns (id_col, n_spans, n_dup_spans, dup_span_ratio): ``n_spans``
    = number of n-token span positions in the document, ``n_dup_spans``
    = positions whose span text also occurs in at least one OTHER
    document (within-doc repeats alone do not count), ``dup_span_ratio``
    = their ratio (0.0 for span-less short docs).

    Exact corpus-level dedup signal at any scale: one aggregate per
    span hash (count distinct docs; map-side combinable) and one
    equi-join back on that hash — never an all-pairs comparison.
    """
    toks = df.select(
        F.col(id_col), tokens_col(F.lower(F.col(text_col))).alias("_toks")
    )
    spans = toks.select(
        F.col(id_col), F.explode(_span_hashes(n)).alias("_h")
    )
    span_docs = spans.groupBy("_h").agg(
        F.count_distinct(F.col(id_col)).alias("_ndocs")
    )
    per_doc = (
        spans.join(span_docs, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("_ndocs") >= 2, 1).otherwise(0)).alias(
                "n_dup_spans"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.round(
                F.coalesce(
                    F.col("n_dup_spans") / F.col("n_spans"), F.lit(0.0)
                ),
                6,
            ).alias("dup_span_ratio"),
        )
    )


def token_chunks(
    df: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size token windows with stride overlap.

    Chunk starts are ``0, stride, 2*stride, ...``; a document of
    ``n_tokens`` tokens yields ``1 + ceil(max(0, n_tokens - chunk) /
    stride)`` chunks, the last possibly partial. Returns (id_col,
    chunk_id, start, n_chunk_tokens, chunk_hash) where ``chunk_hash``
    is md5 over the space-joined chunk tokens — enough to verify chunk
    CONTENT without shipping the text twice.

    Pure scan-side row expansion (sequence + explode + slice): no
    shuffle, no state; at 100 TB this is embarrassingly parallel map
    work whose output partitioning follows the input's.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    toks = df.select(
        F.col(id_col), tokens_col(F.lower(F.col(text_col))).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("_n") - chunk, F.lit(0)) / F.lit(stride)
    ).cast("int")
    out = (
        toks.where(F.col("_n") > 0)
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.col("_n"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .withColumn("start", (F.col("chunk_id") * stride).cast("long"))
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start",
        F.least(F.lit(chunk), F.col("_n") - F.col("start"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("_toks"), F.col("start") + 1, chunk), " ")
        ).alias("chunk_hash"),
    )
