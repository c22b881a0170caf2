"""Bucketized range (interval) join.

Joins a table of intervals ``[start, end)`` to a table of timestamped
points on ``start <= ts < end`` (plus optional equality keys). The
reference's analog is the per-partition chunk-range scan — each query
range selects the chunks whose time interval overlaps it
(ref: pkg/partmgr/partmgr.go:313-321 PartsForRange;
pkg/pquerier/chunkIterator.go range filtering).

Naive Spark expresses this as a join with an inequality predicate,
which Catalyst can only execute as BroadcastNestedLoopJoin — O(n·m)
and a driver OOM once neither side is broadcastable. The scale-safe
shape is bucketization:

* every interval is exploded to the coarse time buckets it covers
  (``sequence(start div b, (end-1) div b)`` — replication factor =
  interval length / bucket size, bounded by construction);
* every point maps to exactly ONE bucket;
* the join becomes an **equi-join on (by…, bucket)** — hash join,
  shuffle on the bucket keys, AQE-skew-splittable — followed by the
  exact residual predicate.

Each (interval, point) pair meets exactly once (in the point's own
bucket), so no post-join dedup is needed. Pick ``bucket_ms`` near the
typical interval length: smaller buckets raise interval replication,
larger buckets raise per-bucket fan-in; correctness holds for any
value (tested at 1s/8s/64s against brute force).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__rj_bucket"


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Rows = interval columns + point columns for every point with
    ``start <= point_ts < end`` (half-open) and equal ``by`` keys.

    ``how="inner"`` keeps only matched pairs; ``how="left"`` also keeps
    intervals with no points (point columns NULL), implemented as a
    second broadcast-able anti join on the interval ids — pass
    intervals with a unique id column for that.
    """
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive")
    by = list(by)
    overlap = [c for c in intervals.columns if c in points.columns and c not in by]
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {overlap}")

    iv = intervals.withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_ms)),
                F.floor((F.col(end_col) - F.lit(1)) / F.lit(bucket_ms)),
            )
        ),
    )
    pt = points.withColumn(_BKT, F.floor(F.col(point_ts) / F.lit(bucket_ms)))

    joined = iv.join(pt, on=by + [_BKT], how="inner").where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    ).drop(_BKT)

    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        missing = intervals.join(
            matched.select(*intervals.columns).distinct(),
            on=intervals.columns,
            how="left_anti",
        )
        for c in points.columns:
            if c not in by:
                missing = missing.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"how must be inner|left, got {how!r}")


def merge_intervals(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    start_col: str = "start",
    end_col: str = "end",
    merge_gap: int = 0,
) -> DataFrame:
    """Merge overlapping/touching ``[start, end)`` intervals per group
    — the union-of-intervals reduction (total downtime from per-check
    alert windows, effective on-call coverage, any "how long was
    ANYTHING wrong" panel). Two intervals merge when the later one
    starts within ``merge_gap`` of the running coverage end; with the
    default 0, touching half-open intervals ([1,5) + [5,9)) merge and
    a 1 ms gap splits.

    Classic sweep: order by (start, end) per group, take the running
    max of prior ends — ``max`` over an unbounded-preceding-to-1-
    preceding ROWS frame, so an interval ENTIRELY INSIDE an earlier
    long one (start later, end earlier) extends nothing and cannot
    split the run — then cut a new island exactly where start exceeds
    the running end + gap. Output per merged interval: start, end,
    source-interval count, and covered duration.

    The input is interval-shaped (episodes, sessions, maintenance
    windows) — already reduced, panel-sized; the window shuffles only
    that. Composes upstream of nothing data-sized: feed it
    alert_episodes output to get the global incident timeline.
    """
    w = Window.partitionBy(*group_cols).orderBy(start_col, end_col)
    run_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.coalesce(
        (F.col(start_col) > run_end + merge_gap).cast("long"), F.lit(1)
    )
    isl = df.withColumn("_isl", F.sum(new_island).over(w))
    return (
        isl.groupBy(*group_cols, "_isl")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .withColumn("covered", F.col("end") - F.col("start"))
        .drop("_isl")
    )
