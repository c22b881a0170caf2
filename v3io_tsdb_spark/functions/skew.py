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

from pyspark.sql import DataFrame
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
    bins = counts.groupBy(
        F.floor(F.log2("_n")).cast("long").alias("bin")
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
