"""Trailing-window z-score anomaly flags over bucketed series.

The ops question "which hours were abnormal for this metric?": bucket
the stream, then score each bucket against the mean/stddev of the
PRECEDING ``lookback`` buckets of the same series (strictly before the
current one — the score never sees the value it judges).

Plan shape: one partial-aggregable groupBy to bucket counts (output
cardinality = series × buckets, tiny next to the input), then a
bounded ROWS window over that ALREADY-SMALL frame — the window's
per-task state is ``lookback`` rows. The expensive input never meets a
window; at 100 TB the stream is reduced by the groupBy before any
ordered pass, which is the difference between this and scoring raw
samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from v3io_tsdb_spark.operators.bucketing import wall_bucket


def bucket_zscores(
    df: DataFrame,
    series_cols: tuple = ("event_type",),
    ts_col: str = "ts_ms",
    step_ms: int = 3_600_000,
    lookback: int = 24,
    min_history: int = 12,
) -> DataFrame:
    """Per (series, bucket): ``n`` events, trailing ``mean``/``std``
    over the previous ``lookback`` buckets, and ``z``.

    Buckets with fewer than ``min_history`` trailing buckets, or zero
    trailing variance, get null ``z`` (no verdict, not z=0). Sample
    stddev (n−1) matches SQL ``stddev_samp``.
    """
    b = wall_bucket(F.col(ts_col), step_ms)
    counts = df.groupBy(*series_cols, b.alias("t")).agg(
        F.count(ts_col).alias("n")
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("t")
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg("n").over(w)
    std = F.stddev_samp("n").over(w)
    hist = F.count("n").over(w)
    # hist >= 2 is required even when min_history <= 1: stddev_samp
    # over a 1-row frame is NaN, and Spark sorts NaN ABOVE every
    # number, so `std > 0` alone would pass and make z NaN instead of
    # the documented null "no verdict".
    z = F.when(
        (hist >= min_history) & (hist >= 2) & (std > 0),
        (F.col("n") - mean) / std,
    )
    # stddev_samp over a 1-row frame is NaN in Spark but NULL in SQL
    # engines; normalize to null (no estimate), matching the oracle.
    return counts.select(
        *series_cols,
        "t",
        "n",
        mean.alias("mean"),
        F.when(hist >= 2, std).alias("std"),
        z.alias("z"),
    )
