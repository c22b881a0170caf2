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


def conversion_latency(
    df: DataFrame,
    from_step: str = "view",
    to_step: str = "purchase",
    bucket_ms: int = 86_400_000,
    anchor_ms: int = 0,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert distribution: for every ``to_step`` event, the
    latency since the same user's MOST RECENT prior ``from_step`` event
    (the as-of pairing), aggregated per time bucket of the conversion —
    count, converted count, mean/min/max latency ms. Conversions with
    no prior ``from_step`` count in ``n`` but not in the latency stats.

    One shuffle: the last-prior-event lookup is a running ``max`` over
    the per-user ordered window (the same exchange any per-user pass
    pays), and the bucket aggregate is map-side combinable. Exact
    integer latencies — no percentile sketch — so the stats are
    engine-reproducible.
    """
    ev = df.where(F.col(type_col).isin(from_step, to_step))
    # total order (ts, type): a from_step event sharing a conversion's
    # exact timestamp sorts deterministically, so "prior" is identical
    # across engines/runs instead of depending on tie order
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, type_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.max(
        F.when(F.col(type_col) == from_step, F.col(ts_col))
    ).over(w)
    conv = (
        ev.withColumn("_prior", prior)
        .where(F.col(type_col) == to_step)
        .withColumn("_lat", F.col(ts_col) - F.col("_prior"))
    )
    bucket = (
        F.lit(anchor_ms)
        + F.floor((F.col(ts_col) - anchor_ms) / bucket_ms) * bucket_ms
    ).cast("long")
    return (
        conv.groupBy(bucket.alias("t"))
        .agg(
            F.count("*").alias("n"),
            F.count("_lat").alias("n_converted"),
            F.round(F.avg("_lat") + 1e-9, 4).alias("avg_latency_ms"),
            F.min("_lat").cast("long").alias("min_latency_ms"),
            F.max("_lat").cast("long").alias("max_latency_ms"),
        )
        .withColumn("n", F.col("n").cast("long"))
        .withColumn("n_converted", F.col("n_converted").cast("long"))
    )


def attribution_report(
    df: DataFrame,
    conversion_type: str = "purchase",
    window_ms: int = 86_400_000,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: each conversion credits the user's most
    recent NON-conversion event within ``window_ms`` before it; the
    report counts conversions per touch type, with conversions whose
    window holds no touch credited to ``(none)`` — the row that keeps
    the report summing to the conversion total (dropping them silently
    is how attribution dashboards lie).

    Self-touch rule: an earlier conversion never attributes a later
    one (the standard last-NON-direct-touch convention, e.g. GA's
    last non-direct click model, public).

    Plan shape: ONE user-keyed exchange — the last-touch lookup is a
    running ``last(ignorenulls)`` over the (ts, type, id)-ordered user
    window (the as-of pattern of conversion_latency, funnel.py:58),
    never a self-join of events; the report aggregate is |event
    types|-bounded.
    """
    order = [F.col(ts_col), F.col(type_col), F.col(id_col)]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col(type_col) != conversion_type,
            F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("e")),
        ),
        ignorenulls=True,
    ).over(w)
    conv = df.withColumn("_touch", touch).where(
        F.col(type_col) == conversion_type
    )
    credited = F.when(
        F.col("_touch").isNotNull()
        & (F.col(ts_col) - F.col("_touch.t") <= window_ms),
        F.col("_touch.e"),
    ).otherwise(F.lit("(none)"))
    return (
        conv.groupBy(credited.alias("touch_type"))
        .agg(F.count("*").cast("long").alias("conversions"))
    )
