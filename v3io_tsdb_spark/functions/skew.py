"""Key-skew profiling: the diagnostic you run BEFORE choosing a
partitioning strategy.

Every skew mitigation in this repo — salting, AQE skew-join splits
(tests/test_plan_audits.py test_aqe_splits_skewed_join), the df caps
on inverted indexes — presumes you KNOW the key distribution. This
operator measures it: a log₂ histogram of per-key row counts plus the
global skew factor (max/mean) and the hottest key's share. At 100 TB
the profile is what decides whether a join needs salting at all, and
how many salt buckets.

Plan shape: one partial-aggregable key-count shuffle (|keys|-sized
output), then a bounded bin aggregate (≤64 rows — log₂ of any count
fits) and a one-row global reduce broadcast back onto the bins. The
raw table is never shuffled twice; nothing data-sized reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Per log₂-bin of per-key row count: ``(bin, n_keys, n_rows,
    bin_row_share)``, with the global ``skew_factor`` (max/mean key
    count) and ``max_key_share`` (hottest key's row fraction) repeated
    on every row — the whole profile reads in one result set.

    ``bin`` = floor(log₂ count): bin 0 holds singleton keys, bin 10
    keys with 1024–2047 rows, etc.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("_n"))
    g = counts.agg(
        F.max("_n").alias("_max_n"),
        F.avg("_n").alias("_mean_n"),
        F.sum("_n").alias("_tot"),
    )
    from v3io_tsdb_spark.functions.detmath import floor_log2_sql

    # exact integer bit-length binning (detmath) — floor(libm log2)
    # can flip at exact powers of two across engines. Emitted as ONE
    # F.expr: the Column form's 62-term loop cost ~0.5s of py4j
    # round-trips per call (r16; same expression, same values)
    bins = counts.groupBy(
        F.expr(floor_log2_sql("_n")).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("_n").cast("long").alias("n_rows"),
    )
    out = bins.crossJoin(F.broadcast(g))
    return out.select(
        "bin",
        "n_keys",
        "n_rows",
        (F.col("n_rows") / F.col("_tot")).alias("bin_row_share"),
        (F.col("_max_n") / F.col("_mean_n")).alias("skew_factor"),
        (F.col("_max_n") / F.col("_tot")).alias("max_key_share"),
    )


def gini_from_counts(
    df: DataFrame,
    key_col: str,
    weight_col: Column | None = None,
) -> DataFrame:
    """Gini coefficient of per-key activity — the inequality summary
    behind "5% of users generate 80% of events" (the Lorenz-curve
    scalar; complements the top-k concentration shares of key_skew
    with a single comparable number in [0, 1)).

        G = (2·Σ_i i·x_i − (n+1)·Σx) / (n·Σx),  x sorted ascending

    The design point is the SORTED-RANK trap: the textbook form ranks
    every key (a data-sized total order). Keys first reduce to their
    activity count, counts then reduce to a HISTOGRAM (count-value →
    n_keys, bounded by the distinct-count vocabulary), and the rank
    sum inside a tied block is the closed-form arithmetic series
    c·(a+b)(b−a+1)/2 over cumulative positions — so the only ordered
    pass runs over the histogram panel, and every term is exact
    integer arithmetic until the final division (rounded 6dp).

    Output: 1 row (n_keys, total, gini).
    """
    # fractional weights (e.g. revenue) round HALF-UP to the nearest
    # integer unit before the histogram — a plain cast('long') would
    # TRUNCATE them (ADVICE r10), biasing every tied-block rank sum
    # low; integer weights pass through exactly (round is identity on
    # integral doubles below 2^52)
    w = weight_col if weight_col is not None else F.lit(1)
    per_key = df.groupBy(key_col).agg(
        F.round(F.sum(w) + 1e-9, 0).cast("long").alias("_c")
    )
    hist = per_key.groupBy("_c").agg(F.count("*").cast("long").alias("_k"))
    wcum = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, 0)
    h = hist.select(
        "_c",
        "_k",
        F.sum("_k").over(wcum).alias("_b"),  # cumulative keys through block
    ).select(
        "_c", "_k", "_b", (F.col("_b") - F.col("_k")).alias("_a0")  # keys before
    )
    # Σ i·x over the block with ranks a0+1 .. b: c·(a0+1+b)·k/2
    term = F.col("_c") * (F.col("_a0") + 1 + F.col("_b")) * F.col("_k")
    agg = h.agg(
        F.sum(term).alias("_2ix"),  # already 2·Σ i·x (the /2 cancels)
        F.sum(F.col("_c") * F.col("_k")).alias("_tot"),
        F.sum("_k").alias("_n"),
    )
    g = F.round(
        (F.col("_2ix") - (F.col("_n") + 1) * F.col("_tot"))
        / (F.col("_n") * F.col("_tot"))
        + 1e-9,
        6,
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_keys"),
        F.col("_tot").cast("long").alias("total"),
        g.alias("gini"),
    )
