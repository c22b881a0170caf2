"""Sketch-based distinct counting with a hard accuracy gate.

``approx_count_distinct`` (HyperLogLog++) is THE scale path for
distinct-user counts — mergeable, constant memory per group, no
shuffle of the raw key set — but an estimate nobody has checked is
just a number. Same pattern as the ANN recall gates
(functions/similarity.py): run the sketch AND the exact count on the
same frame, emit the exact value plus an ``ok`` flag asserting the
estimate landed within tolerance. The exact side is the thing that
stops scaling (its shuffle carries every distinct key); production
keeps only the sketch once the gate has earned trust at sample scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count_gate(
    df: DataFrame,
    key_col: str,
    group_cols: tuple = (),
    rsd: float = 0.02,
    tol: float = 0.05,
) -> DataFrame:
    """Per group: exact distinct ``n_exact`` and ``ok`` = the HLL++
    estimate (relative std dev ``rsd``) is within ``tol`` relative
    error of it. Both counts come out of ONE aggregation pass."""
    agg = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key_col)).alias("n_exact"),
        F.approx_count_distinct(key_col, rsd).alias("_n_approx"),
    )
    # try_divide, not `/`: an all-null group has n_exact=0 and ANSI
    # mode (Spark 4 default) would throw DIVIDE_BY_ZERO. Both counts 0
    # -> the estimate is trivially right (ok=true); null err otherwise
    # impossible here but falls to ok=false via coalesce.
    err = F.try_divide(
        F.abs(F.col("_n_approx") - F.col("n_exact")), F.col("n_exact")
    )
    ok = F.when(
        (F.col("n_exact") == 0) & (F.col("_n_approx") == 0), F.lit(True)
    ).otherwise(F.coalesce(err <= tol, F.lit(False)))
    return agg.select(*group_cols, "n_exact", ok.alias("ok"))
