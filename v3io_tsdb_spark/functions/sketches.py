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


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) of a key column:
    ``d`` hash rows × ``w`` buckets of event counts — the mergeable,
    fixed-size (d·w cells, here 4 KB of longs) frequency summary that
    answers "how often did key X occur?" with one-sided error
    (NEVER an underestimate; overestimate bounded by collisions,
    E[err] <= N/w per row, min over rows in practice far tighter).

    Plan: the d bucket ids are md5-derived scan-side expressions
    (bit-identical in SQL: ``('0x'||substr(md5(r||'_'||key),1,15))::
    BIGINT % w``), exploded d rows per event, then ONE partial-
    aggregable groupBy — at 100 TB every executor emits at most d·w
    partial cells, and sketches of different partitions/days MERGE by
    cell-wise addition (the property HLL shares and exact top-k
    lacks).
    """
    key = F.col(key_col).cast("string")
    from v3io_tsdb_spark.functions.dedup import md5_int60

    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    md5_int60(F.concat(F.lit(str(r)), F.lit("_"), key)), F.lit(w)
                ).alias("b"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def heavy_hitters_gate(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Heavy-hitters with a falsifiable sketch gate (the HLL/ANN trust
    pattern): the exact top-``k`` keys by count (TakeOrdered — never a
    global sort) next to their count-min estimates, with ``ok``
    asserting the CMS one-sided guarantee ``est >= exact`` AND the
    practical bound ``est <= exact + 4·N/w`` (Markov on the per-row
    collision mass, min over d rows). The exact side is what stops
    scaling — its shuffle carries every distinct key; production keeps
    the 4 KB sketch and point-queries it, once the gate has earned
    trust at sample scale.

    All arithmetic is exact integers, so the oracle comparison is
    hash-level with no rounding boundary anywhere.
    """
    key = F.col(key_col).cast("string")
    from v3io_tsdb_spark.functions.dedup import md5_int60

    sketch = cms_sketch(df, key_col, d=d, w=w)
    exact = (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").cast("long").alias("exact"))
        .orderBy(F.desc("exact"), F.col("key"))
        .limit(k)
    )
    probes = exact.select(
        "key",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            md5_int60(
                                F.concat(F.lit(str(r)), F.lit("_"), F.col("key"))
                            ),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("p"),
    ).select("key", "exact", F.col("p.r").alias("r"), F.col("p.b").alias("b"))
    est = (
        probes.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("key", "exact")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
    total = df.agg(F.count("*").alias("_n"))
    return est.crossJoin(F.broadcast(total)).select(
        "key",
        "exact",
        "est",
        (
            (F.col("est") >= F.col("exact"))
            & (F.col("est") <= F.col("exact") + 4 * F.col("_n") / F.lit(w))
        ).alias("ok"),
    )


def hll_rollup_gate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    fine_ms: int,
    coarse_ms: int,
    origin_ms: int = 0,
    group_cols: tuple = (),
    lg_k: int = 12,
    tol: float = 0.05,
) -> DataFrame:
    """Sketch REAGGREGATION — the property HLL actually exists for:
    distinct counts don't add (Σ daily uniques ≠ weekly uniques), so a
    coarser-granularity distinct query normally means re-reading raw
    data. Mergeable sketches break that: build one Datasketches HLL
    per FINE bucket (``hll_sketch_agg``), then answer every COARSE
    bucket by UNIONING the fine sketches (``hll_union_agg``) — the raw
    keys are read exactly once, and the fine-sketch table is the
    rollup artifact a 100 TB deployment persists next to the numeric
    rollup log (same ingest-maintenance contract as rollup.py; sketch
    bytes merge on append exactly like count/sum cells).

    Trust gate like distinct_count_gate: per coarse bucket the merged
    estimate is checked against the exact distinct (`ok` within
    ``tol`` relative error). The exact side is what stops scaling;
    production keeps the fine sketches and drops it once the gate has
    earned trust at sample scale.
    """
    fine = (
        F.lit(origin_ms)
        + F.floor((F.col(ts_col) - F.lit(origin_ms)) / F.lit(fine_ms))
        * F.lit(fine_ms)
    ).cast("long")
    coarse_of = lambda c: (  # noqa: E731
        F.lit(origin_ms)
        + F.floor((c - F.lit(origin_ms)) / F.lit(coarse_ms)) * F.lit(coarse_ms)
    ).cast("long")
    sketches = df.groupBy(*group_cols, fine.alias("_ft")).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias(
            "_sk"
        )
    )
    merged = sketches.groupBy(
        *group_cols, coarse_of(F.col("_ft")).alias("t")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"),
        F.count("*").cast("long").alias("n_fine_buckets"),
    )
    exact = df.groupBy(
        *group_cols, coarse_of(fine).alias("t")
    ).agg(F.count_distinct(F.col(key_col)).alias("n_exact"))
    keys = list(group_cols) + ["t"]
    out = merged.join(exact, keys)
    err = F.try_divide(
        F.abs(F.col("_est") - F.col("n_exact")), F.col("n_exact")
    )
    ok = F.when(
        (F.col("n_exact") == 0) & (F.col("_est") == 0), F.lit(True)
    ).otherwise(F.coalesce(err <= tol, F.lit(False)))
    return out.select(*keys, "n_fine_buckets", "n_exact", ok.alias("ok"))
