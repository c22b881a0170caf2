"""Session windows — gap-based event sessionization.

An extension beyond the reference's fixed/sliding windows (SURVEY §2
A8/A9): Spark's ``session_window`` gives dynamic-length windows that
close ``gap`` after the last event — the standard shape for user
activity analysis over the events feed. Two events belong to one
session iff their time delta is ≤ gap (an event at exactly
``prev + gap`` still merges — verified against Spark's
UpdatingSessionsIterator semantics); the session end is
``last_event + gap``.

Works identically over Structured Streaming input (with a watermark)
— ``session_window`` is one of the few aggregations Spark supports in
update mode with late-data merging, which is why this is expressed as
the built-in rather than a lag/cumsum island computation (that shape
would also break whole-stage codegen for no benefit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.timeutils import str2duration_ms


def sessionize(
    df: DataFrame,
    gap: str | int = "30m",
    ts_col: str = "ts",
    group_cols: tuple = ("name",),
    value_col: str = "value",
) -> DataFrame:
    """Sessions per group: ``(group_cols..., session_start, session_end,
    n_events, sum_value)`` with ``session_end = last_ts + gap``.

    One shuffle on the group keys; the session merge itself is
    Spark-native (no window-function sort chain, no Python).
    """
    gap_ms = str2duration_ms(gap)
    w = F.session_window(
        F.timestamp_millis(F.col(ts_col)), f"{gap_ms} milliseconds"
    ).alias("_sw")
    keys: list[Column] = [F.col(c) if isinstance(c, str) else c for c in group_cols]
    return (
        df.groupBy(w, *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            *[c for c in group_cols if isinstance(c, str)],
            F.unix_millis(F.col("_sw.start")).alias("session_start"),
            F.unix_millis(F.col("_sw.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
