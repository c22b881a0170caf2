"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed/session aggregations cover the reference's
server-side aggregates; what they cannot express is PER-EVENT logic
that depends on the previous event of the same series across
micro-batch boundaries — the classic example being counter-reset
handling for rate/increase (Prometheus semantics; the reference's rate
aggregate divides last-first per bucket and relies on the client to
handle resets, pkg/aggregate/aggregate.go rate path). Here the state
is the per-series ``(last_ts, last_val)`` pair, carried by Spark's
state store with exactly-once semantics across batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("series_key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("increase", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("last_ts", LongType()), StructField("last_val", DoubleType())]
)


def _increase_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-series counter→increase: sorted by ts inside the batch,
    seeded from the cross-batch state. A value drop is a counter reset
    (the post-reset value IS the increase); the first event of a series
    contributes no increase. Events at-or-before the stored last_ts are
    dropped (duplicates / late arrivals already accounted)."""
    if state.exists:
        last_ts, last_val = state.get
    else:
        last_ts, last_val = None, None
    rows = {"series_key": [], "ts": [], "value": [], "increase": []}
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, val in zip(pdf["ts"].values, pdf["value"].values):
            ts = int(ts)
            val = float(val)
            if last_ts is not None and ts <= last_ts:
                continue
            if last_ts is not None:
                rows["series_key"].append(key[0])
                rows["ts"].append(ts)
                rows["value"].append(val)
                rows["increase"].append(val - last_val if val >= last_val else val)
            last_ts, last_val = ts, val
    if last_ts is not None:
        state.update((last_ts, last_val))
    yield pd.DataFrame(rows)


def stream_counter_increase(
    stream_df: DataFrame, key_col: str = "name"
) -> DataFrame:
    """Streaming counter→increase conversion with reset detection.

    Input: a streaming DataFrame with ``(ts long-ms, <key_col> string,
    value double)``. Output (append mode): one row per consecutive
    event pair of a series — ``(series_key, ts, value, increase)``,
    where ``increase`` is the non-negative counter delta
    (Prometheus-style: a drop in the raw counter is a restart and the
    new value is the whole increase).

    Spark-first shape: ``groupBy(key).applyInPandasWithState`` — state
    is ONE tiny row per series (last_ts, last_val) in the state store,
    not a window over history, so memory is O(series), not O(events);
    Arrow moves each micro-batch group as one pandas frame.
    """
    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("series_key"),
            F.col("ts").cast("long").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
        .groupBy("series_key")
        .applyInPandasWithState(
            _increase_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
