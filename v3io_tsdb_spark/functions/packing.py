"""Sequence packing: assign documents to fixed-size context windows.

The standard pretraining "concatenate then chunk" layout: documents are
laid end-to-end in a deterministic order and cut into ``budget``-token
packs; each document is assigned the pack its FIRST token falls in,
plus its offset inside that pack. Downstream loaders can then shuffle
packs, not documents, and every rerun produces byte-identical batches.

Spark shape: a TWO-PASS distributed prefix sum per group
(:mod:`prefixsum`) — packing is embarrassingly parallel ACROSS groups,
and within a group no single task ever sorts the whole group: rows are
quantile-sharded on doc_id, per-shard token subtotals are broadcast
back as offsets, and the running sum finishes shard-locally.
Deterministic (same doc → same pack at any parallelism), no Python,
no explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions.prefixsum import ordered_prefix_sum


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_cols: tuple = ("split", "lang"),
    num_shards: int | None = None,
) -> DataFrame:
    """Add ``pack_id`` / ``pack_offset`` columns.

    ``pack_id = floor(start / budget)`` where ``start`` is the
    cumulative token count of all earlier docs in the group (ordered by
    ``order_col``); ``pack_offset = start % budget``. Documents longer
    than ``budget`` simply span packs, exactly like the concat-chunk
    loader they model. ``order_col`` must be unique within a group.
    ``num_shards`` forwards to :func:`ordered_prefix_sum` (default:
    size-gated auto).
    """
    out = ordered_prefix_sum(
        df, tokens_col, [(order_col, False)], group_cols, "_pack_cum",
        num_shards=num_shards,
    )
    start = (F.col("_pack_cum") - F.col(tokens_col)).cast("long")
    return (
        out.withColumn("pack_id", F.floor(start / F.lit(budget)))
        .withColumn("pack_offset", start % F.lit(budget))
        .drop("_pack_cum")
    )
