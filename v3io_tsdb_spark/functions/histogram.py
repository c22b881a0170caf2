"""Fixed-width histograms as a pure groupBy.

``bucket = floor(x / width)`` is a scan-side expression, so the
histogram is one partial-aggregable shuffle on (group, bucket) — the
cardinality of the OUTPUT (groups × occupied buckets), not the input,
bounds every post-shuffle structure. Empty buckets are simply absent
(same suppression rule as the TSDB aggregation path, ref:
pkg/aggregate/iterator.go:361-364); consumers that need dense axes
densify from the bounded output, never from the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    width: int,
    group_cols: tuple = (),
) -> DataFrame:
    """Per (group, bucket): row count and value sum.

    ``bucket_lo`` is the bucket's inclusive lower edge in value units.
    ``total`` is long for integral value columns (exact, matches SQL
    SUM-of-int) and double for fractional ones — never a silent
    truncation of fractional totals.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    lo = (F.floor(F.col(value_col) / F.lit(width)) * F.lit(width)).cast("long")
    integral = isinstance(
        df.schema[value_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    total = F.sum(value_col)
    if integral:
        total = total.cast("long")
    return (
        df.groupBy(*group_cols, lo.alias("bucket_lo"))
        .agg(F.count(value_col).alias("n"), total.alias("total"))
    )


def value_heatmap(
    df: DataFrame,
    value_col: str,
    width: float,
    ts_col: str = "ts_ms",
    step_ms: int = 86_400_000,
    origin_ms: int = 0,
    group_cols: tuple = (),
) -> DataFrame:
    """Time × value 2D histogram — the Grafana heatmap panel's data
    contract (per time bucket, a value-bucket distribution), which the
    reference serves by re-aggregating raw samples client-side per
    panel query (pkg/formatter renders series, never distributions).

    Both bucket edges are scan-side expressions, so the whole operator
    is ONE partial-aggregable shuffle keyed on (group, t, bucket_lo);
    output cardinality = groups × time buckets × occupied value
    buckets, which is panel-sized however large the input. Empty cells
    are absent (same suppression rule as :func:`fixed_width_histogram`);
    the renderer densifies from the bounded output.
    """
    t = (
        F.lit(origin_ms)
        + F.floor((F.col(ts_col) - F.lit(origin_ms)) / F.lit(step_ms)) * F.lit(step_ms)
    ).cast("long")
    lo = (F.floor(F.col(value_col) / F.lit(width)) * F.lit(width)).cast("double")
    return df.groupBy(
        *group_cols, t.alias("t"), lo.alias("bucket_lo")
    ).agg(F.count(value_col).alias("n"))


def histogram_quantile(
    hist: DataFrame,
    quantiles: tuple,
    group_cols: tuple = (),
    bucket_col: str = "bucket_lo",
    n_col: str = "n",
    width: float = 1.0,
) -> DataFrame:
    """PromQL-style ``histogram_quantile`` reconstruction: per group
    and requested quantile q, the value estimate from the bucketed
    counts — find the first bucket whose cumulative count reaches the
    target rank ``q·N`` and interpolate linearly inside it:
    ``lo + width·(q·N − cum_prev)/n_bucket`` (the exact rule PromQL
    applies to classic histograms). This is the read path the heatmap
    operators feed: at 100 TB nobody re-sorts raw samples for a
    dashboard percentile — the histogram IS the stored aggregate, and
    the quantile is reconstructed from panel-sized data.

    Plan: runs entirely DOWNSTREAM of the one raw-data shuffle that
    built the histogram — one cumulative window per group over the
    panel-sized bucket rows, the quantile list broadcast
    (``len(quantiles)`` rows), a crossing filter, pure arithmetic. The
    crossing predicate ``cum − n < q·N ≤ cum`` selects exactly one
    bucket per (group, q): cumulative counts are strictly increasing
    over occupied buckets, and a target landing exactly on a bucket
    boundary resolves to the LOWER bucket (whose estimate is then its
    exact right edge — continuous across the boundary).

    Exactness: counts are integers and ``q·N`` is one double product
    both engines compute identically, so the only float boundary is
    the final interpolation division (4 dp output rounding, standard
    envelope).
    """
    spark = hist.sparkSession
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    h = hist.select(
        *group_cols,
        F.col(bucket_col).alias("_lo"),
        F.col(n_col).alias("_n"),
        F.sum(n_col).over(wcum).alias("_cum"),
        F.sum(n_col).over(wtot).alias("_tot"),
    )
    from v3io_tsdb_spark.functions.localrel import values_frame

    qs = values_frame(spark, [(float(q),) for q in quantiles], "q double")
    j = h.crossJoin(F.broadcast(qs))
    target = F.col("q") * F.col("_tot")
    crossing = j.where(
        ((F.col("_cum") - F.col("_n")) < target) & (target <= F.col("_cum"))
    )
    est = F.col("_lo") + F.lit(float(width)) * (
        target - (F.col("_cum") - F.col("_n"))
    ) / F.col("_n")
    return crossing.select(
        *group_cols,
        "q",
        est.alias("est"),
        F.col("_tot").cast("long").alias("n_total"),
    )


def benford_profile(
    df: DataFrame, value_col: str = "value", group_cols: tuple = ()
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    fabricated-data / unit-mixup screen (Benford '38; a metric that is
    genuinely scale-spanning follows P(d) = log₁₀(1+1/d), a capped or
    synthetic one doesn't).

    The digit is taken from the INTEGER part (rows with value < 1 are
    excluded): integer→string→first char is bit-exact in every engine,
    where a float log₁₀ first-digit extraction can flip on boundary
    values (99.999…) between libm implementations — the same
    determinism-over-cleverness rule as the md5-derived samplers.

    Output: one row per (group, digit 1-9) with observed count/share,
    the Benford expectation, and the group's total χ² statistic
    repeated on each row (χ² = Σ_d (obs−exp)²/exp over the 9 digits;
    compare against χ²₀.₀₅,₈ = 15.51). Plan: one scan, a ≤9·|groups|
    partial-aggregable digit count, and a window over the 9-row groups
    — nothing data-sized past the first aggregate.
    """
    g = [F.col(c) for c in group_cols]
    digit = F.substring(
        F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = (
        df.where(F.col(value_col) >= 1)
        .groupBy(*g, digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    # χ² must sum over ALL 9 digits — a digit Benford expects but the
    # data never produces is evidence, not a missing row. The domain
    # frame is 9·|groups| rows (groups come from the already-aggregated
    # counts, panel-sized), broadcast-joined back.
    nine = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    if group_cols:
        domain = counts.select(*g).distinct().select(*group_cols, nine)
    else:
        domain = counts.sparkSession.range(1, 2).select(nine)
    full = domain.join(counts, [*group_cols, "digit"], "left").fillna(
        0, subset=["n"]
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols \
        else Window.partitionBy(F.lit(1))
    from v3io_tsdb_spark.functions.detmath import benford_expected_col

    tot = F.sum("n").over(w)
    # shared-literal table (detmath.BENFORD_EXPECTED): a constant
    # computed once at authoring time, not per-engine libm log10
    expected = benford_expected_col(F.col("digit"))
    # try_divide: a group with zero qualifying rows (all values < 1)
    # yields null shares/χ² — no verdict, not a 0/0 crash under ANSI
    # explicit square, not pow(·, 2): libm pow is not guaranteed
    # correctly rounded even at integral exponents (detmath class)
    dev = F.col("n") - expected * tot
    scored = full.withColumn(
        "share", F.try_divide(F.col("n"), tot)
    ).withColumn("expected", expected).withColumn(
        "_chi_part",
        F.try_divide(dev * dev, expected * tot),
    )
    return scored.withColumn("chi2", F.sum("_chi_part").over(w)).drop(
        "_chi_part"
    )


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    width: float,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability index between two snapshots of one metric
    over fixed-width bins — the standard drift gate (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 shifted; credit-scoring practice, public)
    a training pipeline runs between corpus versions before retraining.

    Fixed bins (floor(value/width)), NOT quantiles: quantile edges move
    with the data being tested, so two drifted snapshots can land in
    identical quantile bins — the same fixed-bin rule as
    logprob_profile. Empty-side shares clamp to ``eps`` (PSI's log is
    undefined at 0; the clamp bounds any single bin's contribution).

    Output: one row per bin present in either side — (bin, share_a,
    share_b, psi_part) — with the total ``psi`` repeated per row.
    Plan: each side reduces to bin counts independently (partial-agg),
    a bin-keyed full-outer join of two panel-sized tables, a window
    over the bins. Nothing data-sized past the first aggregates.
    """
    def bins(df, side):
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(F.floor(F.col(value_col) / width).cast("long").alias("bin"))
            .agg(F.count("*").alias(f"_n_{side}"))
        )

    j = bins(a, "a").join(bins(b, "b"), "bin", "full_outer").fillna(
        0, subset=["_n_a", "_n_b"]
    )
    w = Window.partitionBy(F.lit(1))
    # try_divide: an EMPTY side has window-sum 0 and Spark 4's ANSI mode
    # would throw DIVIDE_BY_ZERO on plain `/`; null then clamps to eps
    # below (greatest skips nulls), matching the documented behavior.
    pa = F.greatest(F.try_divide(F.col("_n_a"), F.sum("_n_a").over(w)), F.lit(eps))
    pb = F.greatest(F.try_divide(F.col("_n_b"), F.sum("_n_b").over(w)), F.lit(eps))
    from v3io_tsdb_spark.functions.detmath import with_det_ln

    scored = j.select("bin", pa.alias("share_a"), pb.alias("share_b"))
    scored = with_det_ln(
        scored, "_lnr", F.col("share_a") / F.col("share_b")
    ).select(
        "bin",
        "share_a",
        "share_b",
        ((F.col("share_a") - F.col("share_b")) * F.col("_lnr")).alias(
            "psi_part"
        ),
    )
    return scored.withColumn("psi", F.sum("psi_part").over(w))


def ks_2sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: tuple = (),
    alpha_c: float = 1.358,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group — the
    bin-free sibling of :func:`psi_drift`: D = max |ECDF_a − ECDF_b|,
    sensitive to ANY distributional difference (location, scale,
    shape) where PSI only sees mass moving between its fixed bins. The
    large-sample rejection bound D > c(α)·sqrt((n_a+n_b)/(n_a·n_b))
    ships as a flag with c(0.05) = 1.358 (Smirnov's asymptotic table,
    public).

    Scale-right plan — the naive formulation sorts every raw row per
    group; this one never does: values are 6dp-rounded (the repo's
    determinism boundary — D is then exact for the rounded data) and
    each side reduces FIRST to per-distinct-value counts — a
    partial-aggregable shuffle whose output is distinct-value-sized —
    so the ordered cumulative pass runs over that bounded panel. Both
    ECDFs step at every observed value from either side, which is
    exactly where |F_a − F_b| attains its max. An empty side has no
    ECDF: null D, no verdict (the try_divide convention).

    Output per group: ``n_a, n_b, ks_d, reject``.
    """
    eps = 1e-9

    def _tag(df, ca, cb):
        return df.select(
            *group_cols,
            F.round(F.col(value_col) + eps, 6).alias("_v"),
            F.lit(ca).alias("_ca"),
            F.lit(cb).alias("_cb"),
        )

    u = _tag(a, 1, 0).unionByName(_tag(b, 0, 1))
    counts = u.groupBy(*group_cols, "_v").agg(
        F.sum("_ca").alias("_na_v"), F.sum("_cb").alias("_nb_v")
    )
    w_part = Window.partitionBy(*group_cols)
    w_cum = w_part.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        counts.withColumn("_cum_a", F.sum("_na_v").over(w_cum))
        .withColumn("_cum_b", F.sum("_nb_v").over(w_cum))
        .withColumn("_n_a", F.sum("_na_v").over(w_part))
        .withColumn("_n_b", F.sum("_nb_v").over(w_part))
    )
    diff = F.when(
        (F.col("_n_a") > 0) & (F.col("_n_b") > 0),
        F.abs(
            F.col("_cum_a") / F.col("_n_a") - F.col("_cum_b") / F.col("_n_b")
        ),
    )
    g = c.groupBy(*group_cols).agg(
        F.first("_n_a").alias("n_a"),
        F.first("_n_b").alias("n_b"),
        F.round(F.max(diff) + eps, 6).alias("ks_d"),
    )
    crit = alpha_c * F.sqrt(
        (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
    )
    reject = F.when(
        F.col("ks_d").isNotNull(),
        (F.col("ks_d") > F.round(crit + eps, 6)).cast("long"),
    )
    return g.select(
        *group_cols, "n_a", "n_b", "ks_d", reject.alias("reject")
    )
