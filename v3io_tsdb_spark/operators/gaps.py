"""Per-series gap / completeness report.

Answers "which series have holes, and how big?" — the monitoring
counterpart of interpolation (which FILLS holes; this one measures
them, the check a scrape pipeline runs before trusting a rollup).

Per series over its own [first, last] sample envelope on a fixed grid:

- ``expected``: wall-aligned grid buckets the envelope spans,
- ``present``: distinct buckets that actually hold a sample,
- ``missing``: expected − present,
- ``max_gap_ms``: largest timestamp delta between consecutive samples.

Plan shape: ONE scan of the samples, one hash-partition by series for
the ``lag`` window, then a single per-series aggregate (max gap,
min/max ts, count-distinct bucket) that arrives already partitioned by
its key — no second scan, no join. Nothing materializes the grid
itself: ``expected`` is arithmetic on first/last, so a series with a
year-long hole costs the same as a dense one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from v3io_tsdb_spark.operators.bucketing import wall_bucket


def gap_report(
    df: DataFrame,
    series_cols: tuple = ("name", "uid"),
    ts_col: str = "t",
    step_ms: int = 21_600_000,
) -> DataFrame:
    """One row per series: expected/present/missing bucket counts and
    the largest inter-sample gap (ms)."""
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    agg = (
        df.withColumn("_gap", gap)
        .groupBy(*series_cols)
        .agg(
            F.max("_gap").alias("max_gap_ms"),
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
            F.count_distinct(wall_bucket(F.col(ts_col), step_ms)).alias("present"),
        )
    )
    expected = (
        F.floor(F.col("_last") / step_ms) - F.floor(F.col("_first") / step_ms) + 1
    ).cast("long")
    return (
        agg.withColumn("expected", expected)
        .withColumn("missing", (F.col("expected") - F.col("present")).cast("long"))
        .drop("_first", "_last")
    )
