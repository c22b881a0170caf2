"""Weekly cohort retention over an event stream.

The standard retention triangle: users are cohorted by the week of
their FIRST event; for each (cohort_week, week_offset) cell, count the
distinct cohort users active in that week.

Plan shape: per-user first-event time is a partial-aggregable
``groupBy(user).agg(min(ts))`` (map-side combine, no window); activity
is a distinct over (user, week) — both shuffles hash on ``user`` so
AQE can reuse/co-locate the exchange, and the join of activity to the
(much smaller, one-row-per-user) cohort table is a same-key
hash join. Nothing is per-row Python; the triangle output is
O(weeks²) rows regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.operators.bucketing import wall_bucket

WEEK_MS = 7 * 86_400_000


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    week_ms: int = WEEK_MS,
) -> DataFrame:
    """Rows: (cohort_week, week_offset, n_users) — ``week_offset`` 0 is
    the cohort's own week, so its n_users is the cohort size."""
    cohorts = df.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    cohorts = cohorts.select(
        user_col, wall_bucket(F.col("_first"), week_ms).alias("cohort_week")
    )
    active = df.select(
        user_col, wall_bucket(F.col(ts_col), week_ms).alias("_week")
    ).distinct()
    return (
        active.join(cohorts, user_col)
        .withColumn(
            "week_offset",
            ((F.col("_week") - F.col("cohort_week")) / week_ms).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
