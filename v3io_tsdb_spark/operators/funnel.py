"""Ordered funnel analysis over an event stream.

The classic product-analytics question — "who completed view → click →
purchase, in order?" — computed greedily: step k's completion time is
the EARLIEST event of that type strictly after step k-1's completion.

Plan shape: every step is a conditional min over the same
``partitionBy(user)`` window, so the chain costs ONE shuffle of the
events (Spark reuses the exchange across same-key window passes) plus
a per-user aggregate that arrives already partitioned. No self-joins
of the fact table, no per-step scans — at 100 TB this is a single
hash-partition of events by user, which any per-user analysis pays
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel completion times.

    Returns one row per user that reached step 1, with ``t_<step>``
    (epoch-ms of the greedy completion, null once the chain breaks)
    and ``steps_completed``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    out = df
    prev = None
    tcols = []
    for s in steps:
        c = f"t_{s}"
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(c, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = c
        tcols.append(c)
    agg = out.groupBy(user_col).agg(*[F.first(c).alias(c) for c in tcols])
    completed = sum(
        (F.col(c).isNotNull().cast("int") for c in tcols), F.lit(0)
    )
    return agg.where(F.col(tcols[0]).isNotNull()).withColumn(
        "steps_completed", completed.cast("long")
    )
