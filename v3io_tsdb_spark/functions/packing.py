"""Sequence packing: assign documents to fixed-size context windows.

The standard pretraining "concatenate then chunk" layout: documents are
laid end-to-end in a deterministic order and cut into ``budget``-token
packs; each document is assigned the pack its FIRST token falls in,
plus its offset inside that pack. Downstream loaders can then shuffle
packs, not documents, and every rerun produces byte-identical batches.

Spark shape: one window cumulative sum per group — packing is
embarrassingly parallel ACROSS groups (split × lang here; at 100 TB add
a shard key derived from the doc id to bound group size), and the
within-group ordered prefix sum is the price of determinism: the same
doc must land in the same pack no matter how the cluster partitions the
scan. No Python, no explode; one shuffle (the window partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_cols: tuple = ("split", "lang"),
) -> DataFrame:
    """Add ``pack_id`` / ``pack_offset`` columns.

    ``pack_id = floor(start / budget)`` where ``start`` is the
    cumulative token count of all earlier docs in the group (ordered by
    ``order_col``); ``pack_offset = start % budget``. Documents longer
    than ``budget`` simply span packs, exactly like the concat-chunk
    loader they model.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return df.withColumn("pack_id", F.floor(start / F.lit(budget))).withColumn(
        "pack_offset", start % F.lit(budget)
    )
