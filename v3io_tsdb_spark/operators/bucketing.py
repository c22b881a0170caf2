"""Step-bucket expressions.

Query buckets are anchored at the query ``from`` time — cell index is
``(t - from) / step`` (ref: pkg/pquerier/collector.go:383-391,
getRelativeCell). Rollup buckets are wall-aligned —
``floor(ts / granularity) * granularity`` (ref:
pkg/partmgr/partmgr.go:564-569 TimeToChunkID analog).

Sliding (AggregationWindow) semantics (ref:
pkg/pquerier/collector.go:345-381 windowAggregation): buckets sit on
the ``from``-anchored grid, right-aligned (round-up cell); a sample at
``t`` contributes to every bucket ``b`` on the grid with
``b − window <= t <= b`` (closed interval when window > step; when
window < step the right-aligned bucket is used iff ``t >= b − window``;
window == step degenerates to the tumbling round-up bucket).

The sliding fan-out is expressed as ``explode(sequence(...))`` — each
sample row expands to its (few) covered buckets and the aggregation
stays a plain shuffle-on-bucket groupBy, which scales linearly and
never materializes per-bucket sample lists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tumbling_bucket(ts_col: Column, from_ms: int, step_ms: int) -> Column:
    """from-anchored floor bucket time (ms) for a sample timestamp."""
    return (F.floor((ts_col - F.lit(from_ms)) / F.lit(step_ms)) * F.lit(step_ms) + F.lit(from_ms)).cast("long")


def wall_bucket(ts_col: Column, gran_ms: int) -> Column:
    """Wall-aligned rollup bucket time (ms)."""
    return (F.floor(ts_col / F.lit(gran_ms)) * F.lit(gran_ms)).cast("long")


def sliding_bucket_ids(
    ts_col: Column, from_ms: int, to_ms: int, step_ms: int, window_ms: int
) -> Column:
    """Array of bucket times (ms) a sample contributes to under an
    aggregation window; feed to ``explode``.

    k_first = ceil((t-from)/step) — the right-aligned cell.
    window >  step: k_last = floor((t-from+window)/step)   (closed [b-w, b])
    window <= step: contributes to k_first iff t >= from + k_first*step - window.
    Buckets outside [from, to] are clipped.
    """
    rel = ts_col - F.lit(from_ms)
    k_first = F.ceil(rel / F.lit(step_ms)).cast("long")
    if window_ms > step_ms:
        k_last = F.floor((rel + F.lit(window_ms)) / F.lit(step_ms)).cast("long")
    else:
        ok = rel >= (k_first * F.lit(step_ms) - F.lit(window_ms))
        k_last = F.when(ok, k_first).otherwise(k_first - 1)
    k_max = (to_ms - from_ms) // step_ms
    k_first = F.greatest(k_first, F.lit(0))
    k_last = F.least(k_last, F.lit(int(k_max)))
    buckets = F.when(
        k_last >= k_first,
        F.transform(
            F.sequence(k_first, k_last),
            lambda k: (k * F.lit(step_ms) + F.lit(from_ms)).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return buckets
