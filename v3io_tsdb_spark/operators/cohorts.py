"""Weekly cohort retention over an event stream.

The standard retention triangle: users are cohorted by the week of
their FIRST event; for each (cohort_week, week_offset) cell, count the
distinct cohort users active in that week.

Plan shape: ONE scan of the events. The stream is first reduced to
distinct (user, week) — a partial-aggregable shuffle whose output is
user-count-sized — and the cohort week is a ``min`` window over that
already-small frame partitioned by user (no self-join, no second scan
of the fact table). The final triangle aggregate is O(weeks²) rows
regardless of event volume. Nothing is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    active = df.select(
        user_col, wall_bucket(F.col(ts_col), week_ms).alias("_week")
    ).distinct()
    w = Window.partitionBy(user_col)
    return (
        active.withColumn("cohort_week", F.min("_week").over(w))
        .withColumn(
            "week_offset",
            ((F.col("_week") - F.col("cohort_week")) / week_ms).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def new_vs_returning(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    step_ms: int = 86_400_000,
) -> DataFrame:
    """Daily active users split into new vs returning — the growth
    dashboard's first panel, and the cohort triangle's marginal: per
    bucket, ``active`` distinct users, ``new`` whose FIRST-ever bucket
    this is, ``returning`` the rest.

    Plan shape mirrors retention_cohorts exactly: reduce the stream to
    distinct (user, bucket) — partial-aggregable, user-count-sized
    output — take each user's first bucket as a ``min`` window over
    that small frame (no self-join, no second scan), then a
    bucket-keyed aggregate whose output is |buckets| rows.
    """
    ub = df.select(
        F.col(user_col).alias("_u"),
        wall_bucket(F.col(ts_col), step_ms).alias("t"),
    ).distinct()
    first = F.min("t").over(Window.partitionBy("_u"))
    scored = ub.withColumn("_is_new", (F.col("t") == first).cast("long"))
    return scored.groupBy("t").agg(
        F.count("*").cast("long").alias("active"),
        F.sum("_is_new").cast("long").alias("new"),
        (F.count("*") - F.sum("_is_new")).cast("long").alias("returning"),
    )
