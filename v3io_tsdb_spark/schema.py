"""Core table schemas.

Long-format samples table + rollup table, per SURVEY.md §7.1 and the
reference's data model (ref: pkg/aggregate/aggregate.go:68-79 for the
rollup fields; pkg/appender/appender.go:194-208 for the sample shape).

All timestamps are int64 Unix milliseconds (``ts`` / ``bucket``),
matching the reference and avoiding timezone ambiguity; a derived
``dt`` (yyyy-MM-dd string) partitions the storage table so time-range
predicates prune Parquet partitions.
"""

from __future__ import annotations

from pyspark.sql import types as T

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType(), False),  # unix ms
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("series_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("value_str", T.StringType(), True),  # variant metrics
    ]
)

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType(), False),  # unix ms, floor(ts/gran)*gran
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("series_id", T.LongType(), True),
        T.StructField("count", T.LongType(), True),
        T.StructField("sum", T.DoubleType(), True),
        T.StructField("sqr", T.DoubleType(), True),  # sum(v*v)
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("last", T.DoubleType(), True),
        T.StructField("last_ts", T.LongType(), True),
    ]
)
