"""Distributed ordered prefix sum — the scale-safe running total.

A naive ``Window.partitionBy(group).orderBy(key)`` prefix sum ships
every group to ONE task: at 100 TB a ``lang='en'`` group is billions of
rows sorted on a single executor. This module implements the classic
two-pass distributed cumulative sum:

1. **Deterministic sharding**: per-group quantile boundaries of the
   LEADING order key (one tiny ``percentile_approx`` row per group,
   broadcast back) turn into a shard id via an array-filter expression.
   The shard is a pure function of the ROW — crucially NOT of physical
   partitioning: ``repartitionByRange`` + ``spark_partition_id()``
   looks equivalent but its boundaries are re-SAMPLED with a fresh seed
   on every evaluation (measured: three runs, three boundary sets), so
   the self-join below would key subtotals to one sharding and data
   rows to another, silently corrupting sums. Quantile bounds are data,
   so every evaluation agrees.
2. **Per-shard subtotals**: one ``sum(value)`` row per
   ``(shard, group)`` — at most ``n × |groups|`` rows, tiny.
3. **Exclusive shard offsets**: a running sum over the SUBTOTAL table
   (ordered by shard id within each group) — cheap because the input
   is the tiny table from step 2, not the data.
4. **Broadcast-join** the offsets back and finish with a
   PARTITION-LOCAL running sum: the heavy window partitions by
   ``(shard, group)``, so no task ever sees more than one shard's
   slice of one group.

The result is identical to the single-window form whenever the
``(group, order)`` key is total (unique per row) — which both callers
guarantee (``doc_id`` tiebreaker) — because shard assignment is
monotone in the sort order (rows tied on the leading key share a
shard) and shard offsets + local running sums telescope to the global
prefix wherever the quantile boundaries fall.

Balance caveat: sharding keys on the LEADING order column only, so a
group whose leading key is one massive tie (every row the same
quality) degrades to one shard = one task for that group — the naive
window's behavior, no worse. Callers with high-tie leading keys should
pass a higher-cardinality leading column or pre-round less.

Size gate: the two-pass machinery (quantile pre-pass, broadcast join,
subtotal window) costs 3 extra jobs — pure overhead when every group
already fits one task. When ``num_shards`` is not forced, a cheap
``groupBy().count()`` pre-pass measures the LARGEST group and sizes the
fan-out as ``ceil(max_group_rows / target_rows_per_shard)`` capped at
``spark.sql.shuffle.partitions``; groups under the target bypass to the
plain single-window form. Same measured-size gate as
``connected_components``' 1M-edge union-find cutoff
(functions/dedup.py). The count pre-pass is one column-pruned scan —
at 100 TB it reads only the group columns and combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# internal column names; underscore-prefixed to stay out of user schemas
_PID = "_ps_pid"
_SUB = "_ps_sub"
_OFF = "_ps_off"
_BNDS = "_ps_bnds"

# rows of ONE group a single task is allowed to sort before the
# two-pass sharding pays for itself; ~2M rows of (key, long) sort in
# well under a second per task, while the sharded form adds 3 jobs
DEFAULT_TARGET_ROWS_PER_SHARD = 2_000_000


def ordered_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_keys: list[tuple[str, bool]],
    group_cols: tuple,
    out_col: str,
    num_shards: int | None = None,
    target_rows_per_shard: int = DEFAULT_TARGET_ROWS_PER_SHARD,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_keys`` order within each ``group_cols`` group, computed
    without ever sorting a whole group on one task.

    ``order_keys``: list of ``(column_name, descending)``; together
    they must totally order each group (include a unique tiebreaker),
    and the leading column must be numeric (it feeds the quantile
    sharder). ``group_cols`` must be non-empty.

    ``num_shards=None`` (default) measures the largest group and sizes
    the fan-out to ``ceil(max_rows / target_rows_per_shard)``; when
    that is 1 (all groups fit a task) the whole two-pass machinery is
    bypassed for a plain per-group window. Pass ``num_shards``
    explicitly to force either shape.
    """
    spark = df.sparkSession
    sort_exprs = [F.col(c).desc() if d else F.col(c).asc() for c, d in order_keys]
    if num_shards is None:
        row = (
            df.groupBy(*group_cols)
            .count()
            .agg(F.max("count").alias("m"))
            .first()
        )
        max_rows = int(row["m"] or 0)
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n = max(1, min(cap, -(-max_rows // target_rows_per_shard)))
    else:
        n = num_shards

    if n <= 1:
        # every group fits one task: the naive window IS the right plan
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(*sort_exprs)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out_col, F.sum(value_col).over(w).cast("long"))

    lead, lead_desc = order_keys[0]

    qs = [i / n for i in range(1, n)]
    bounds = df.groupBy(*group_cols).agg(
        F.percentile_approx(F.col(lead).cast("double"), qs, 1000).alias(_BNDS)
    )
    key = F.col(lead).cast("double")
    if lead_desc:  # shard grows as the key falls; NULLS LAST
        shard = F.size(F.filter(F.col(_BNDS), lambda b: b > key))
        null_shard = F.lit(n)
    else:  # ascending; NULLS FIRST sorts before every boundary
        shard = F.size(F.filter(F.col(_BNDS), lambda b: b < key))
        null_shard = F.lit(-1)
    sharded = (
        df.join(F.broadcast(bounds), list(group_cols))
        .withColumn(_PID, F.when(key.isNull(), null_shard).otherwise(shard))
        .drop(_BNDS)
    )

    sub = sharded.groupBy(_PID, *group_cols).agg(F.sum(value_col).alias(_SUB))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = sub.withColumn(_OFF, F.sum(_SUB).over(w_off) - F.col(_SUB)).drop(_SUB)

    w_local = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sharded.join(F.broadcast(offsets), on=[_PID, *group_cols])
        .withColumn(out_col, (F.col(_OFF) + F.sum(value_col).over(w_local)).cast("long"))
        .select(*df.columns, out_col)  # join put keys first; restore input order
    )
