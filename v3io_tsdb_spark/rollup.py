"""Rollup (pre-aggregate) table maintenance.

The reference maintains per-series, per-bucket aggregate arrays
(count/sum/sqr/min/max/last) updated by server-side expressions at
ingest time (ref: pkg/aggregate/aggregate.go:68-79,
pkg/aggregate/functions.go:30-151, pkg/appender/store.go:374-397).

Spark-first design: the rollup is an **append-only partial-aggregate
log**. Every ingested batch appends one partially-aggregated row per
(series, bucket); the query path (and the optional compactor) merges
partials with the standard mergeable-aggregate algebra:

    count=Σcount, sum=Σsum, sqr=Σsqr, min=min(min), max=max(max),
    last=argmax(last, last_ts)

This keeps ingest free of read-modify-write (no MERGE needed on plain
Parquet), is idempotent-friendly, and scales: each batch does exactly
one map-side-combinable groupBy. Cross-label pre-aggregates
(ref: pkg/appender/appender.go:220-231) are additional rollup tables
keyed by a label subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.labels import labels_map_col, labels_string_col
from v3io_tsdb_spark.operators.bucketing import wall_bucket

ROLLUP_AGG_COLS = ("count", "sum", "sqr", "min", "max", "last", "last_ts")


def build_rollup(samples: DataFrame, gran_ms: int) -> DataFrame:
    """Partial rollup rows for a batch of samples (float metrics only).

    The labels map rides through the groupBy as a serialized group-key
    string (constant per series_id, so groups are unchanged) — a
    map-typed first() would force SortAggregate."""
    v, t = F.col("value"), F.col("ts")
    return (
        samples.where(v.isNotNull())
        .withColumn("bucket", wall_bucket(t, gran_ms))
        .withColumn("_lstr", labels_string_col(F.col("labels")))
        .groupBy("name", "series_id", "_lstr", "bucket")
        .agg(
            F.count(v).alias("count"),
            F.sum(v).alias("sum"),
            F.sum(v * v).alias("sqr"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.max_by(v, t).alias("last"),
            F.max(t).alias("last_ts"),
        )
        .withColumn("labels", labels_map_col(F.col("_lstr")))
        .select(
            "bucket", "name", "labels", "series_id",
            "count", "sum", "sqr", "min", "max", "last", "last_ts",
        )
    )


def build_label_rollup(samples: DataFrame, gran_ms: int, label_subset: tuple) -> DataFrame:
    """Cross-label pre-aggregate: rollup keyed by a label subset
    (ref: pkg/partmgr/partmgr.go:472-485 agg/<labels>/ path)."""
    v, t = F.col("value"), F.col("ts")
    keys = [F.element_at(F.col("labels"), k).alias(k) for k in label_subset]
    return (
        samples.where(v.isNotNull())
        .withColumn("bucket", wall_bucket(t, gran_ms))
        .groupBy(F.col("name"), *keys, F.col("bucket"))
        .agg(
            F.count(v).alias("count"),
            F.sum(v).alias("sum"),
            F.sum(v * v).alias("sqr"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.max_by(v, t).alias("last"),
            F.max(t).alias("last_ts"),
        )
    )


def merge_partials(rollup: DataFrame) -> DataFrame:
    """Compact partial rollup rows to one row per (series, bucket)."""
    return (
        rollup.withColumn("_lstr", labels_string_col(F.col("labels")))
        .groupBy("name", "series_id", "_lstr", "bucket")
        .agg(
            F.sum("count").alias("count"),
            F.sum("sum").alias("sum"),
            F.sum("sqr").alias("sqr"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.max_by("last", "last_ts").alias("last"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn("labels", labels_map_col(F.col("_lstr")))
        .select(
            "bucket", "name", "labels", "series_id",
            "count", "sum", "sqr", "min", "max", "last", "last_ts",
        )
    )
