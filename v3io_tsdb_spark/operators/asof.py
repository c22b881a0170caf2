"""As-of (nearest-predecessor) join.

The reference's seek-based lookup joins a query timestamp to the most
recent sample at-or-before it (ref: pkg/pquerier/chunkIterator.go:77-171
``Seek``; the interpolation "prev" semantics in
pkg/pquerier/interpolate.go:75-88). This module generalizes that into a
public operator: for every left row, attach the latest right row with
``right.on <= left.on`` (direction="backward", inclusive) sharing the
same ``by`` keys — the ASOF JOIN of kdb+/DuckDB/Pandas ``merge_asof``.

Spark-first design — NO inequality join, NO nested loop:

* **Single-window path** (default): tag the two sides, ``unionByName``,
  one window over ``(by…, on, side)`` carrying the last non-null right
  payload. One shuffle on the ``by`` keys; the sort is the window's
  own local sort. Right rows order before left rows at equal ``on`` so
  the join is inclusive, matching DuckDB ``ASOF`` (``>=``).

* **Bucketed two-level path** (``bucket_ms=...``): at 100 TB a single
  window puts an entire key's history in one task. Instead both sides
  are hashed into coarse time buckets and the window runs per
  ``(by…, bucket)`` — bounded task size regardless of key skew. Rows
  whose bucket contains no earlier right row take their match from a
  tiny carry-in table: per-(key, bucket) "last right payload" rolled
  forward across buckets with a second window whose partitions hold
  one row per ACTIVE bucket (thousands, not billions). Both paths are
  exact and tested equivalent.

``direction="forward"`` (earliest right row at-or-after) reuses the
backward machinery on negated timestamps.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAY = "__asof_payload"
_BKT = "__asof_bucket"
_NEG = "__asof_neg_on"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    value_cols: Optional[Iterable[str]] = None,
    direction: str = "backward",
    tolerance_ms: Optional[int] = None,
    suffix: str = "_r",
    bucket_ms: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the matched right row's
    ``value_cols`` (renamed ``<col><suffix>``) and its timestamp
    (``<on><suffix>``). Unmatched (or out-of-tolerance) rows keep the
    left columns with NULL right columns — a LEFT ASOF join.

    right rows with duplicate ``(by…, on)`` make the match value
    ambiguous (same as DuckDB/kdb) — pre-aggregate the right side if
    the data allows ties.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    value_cols = list(value_cols)

    if direction == "forward":
        lneg = left.withColumn(_NEG, -F.col(on))
        rneg = right.withColumn(_NEG, -F.col(on))
        out = asof_join(
            lneg, rneg, on=_NEG, by=by, value_cols=value_cols,
            direction="backward", tolerance_ms=tolerance_ms,
            suffix=suffix, bucket_ms=bucket_ms,
        )
        # the matched right timestamp came back negated
        return out.withColumn(f"{_NEG}{suffix}", -F.col(f"{_NEG}{suffix}")) \
                  .withColumnRenamed(f"{_NEG}{suffix}", f"{on}{suffix}") \
                  .drop(_NEG)

    payload = F.struct(F.col(on).alias("__on"), *[F.col(c) for c in value_cols])
    r = right.select(*by, F.col(on), payload.alias(_PAY), F.lit(0).alias(_SIDE))
    l = left.withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)  # left-only cols NULL on right rows (dropped later)

    if bucket_ms is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    else:
        matched = _bucketed_match(u, on, by, bucket_ms)

    out = matched.where(F.col(_SIDE) == 1).drop(_SIDE)
    m = F.col(_PAY)
    if tolerance_ms is not None:
        m = F.when(F.col(on) - F.col(_PAY)["__on"] <= F.lit(tolerance_ms), m)
    proj = [F.col(c) for c in left.columns] + [m["__on"].alias(f"{on}{suffix}")]
    proj += [m[c].alias(f"{c}{suffix}") for c in value_cols]
    return out.select(*proj)


def _bucketed_match(u: DataFrame, on: str, by: list, bucket_ms: int) -> DataFrame:
    """Two-level exact match: within-bucket window + cross-bucket
    carry-in, both shuffles on (by…, bucket)."""
    u = u.withColumn(_BKT, F.floor(F.col(on) / F.lit(bucket_ms)))

    w_in = (
        Window.partitionBy(*by, _BKT)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = u.withColumn("__within", F.last(_PAY, ignorenulls=True).over(w_in))

    # last right payload of each ACTIVE (key, bucket): one row per
    # bucket that has any row at all, so the carry table is tiny and
    # the per-key cross-bucket window sees thousands of rows, not the
    # raw data. max(struct(on, payload)) picks the latest right row.
    carry_src = u.groupBy(*by, _BKT).agg(
        F.max(F.when(F.col(_SIDE) == 0, F.struct(F.col(on).alias("__on2"), F.col(_PAY).alias("__p"))))
        .alias("__last")
    )
    w_carry = (
        Window.partitionBy(*by)
        .orderBy(F.col(_BKT).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = carry_src.withColumn(
        "__carry", F.last(F.col("__last")["__p"], ignorenulls=True).over(w_carry)
    ).select(*by, _BKT, "__carry")

    joined = within.join(carry, on=by + [_BKT], how="left")
    return joined.withColumn(_PAY, F.coalesce(F.col("__within"), F.col("__carry"))) \
                 .drop("__within", "__carry", _BKT)
