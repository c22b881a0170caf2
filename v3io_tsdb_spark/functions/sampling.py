"""Deterministic sampling / train-val-test splitting for training-data
pipelines.

Everything here is HASH-derived, never random: the same row lands in
the same split/sample on every run, on every engine, at any
parallelism — the property a 100 TB pipeline needs so that re-runs,
backfills, and incremental appends are consistent, and the property
that makes these operators oracle-checkable in plain SQL. The bucket
hash reuses the md5-int60 trick from the dedup sketches
(``('0x' || substr(md5(x), 1, 15))::BIGINT`` in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions.dedup import md5_int60

N_BUCKETS = 10_000


def hash_bucket_col(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, N_BUCKETS) from md5(salt || key).

    The salt decorrelates independent uses (a sample drawn with one
    salt is unbiased within a split drawn with another).
    """
    return md5_int60(F.concat(F.lit(salt), key.cast("string"))) % F.lit(N_BUCKETS)


def split_col(key: Column, weights: dict[str, float], salt: str = "split") -> Column:
    """Deterministic split label from cumulative weight ranges over the
    hash bucket: ``{"train": .9, "val": .05, "test": .05}`` maps bucket
    [0,9000) → train, [9000,9500) → val, [9500,10000) → test."""
    total = sum(weights.values())
    bucket = hash_bucket_col(key, salt)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        hi = int(round(acc / total * N_BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic train/val/test split column."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_col(F.col(key_col), weights, salt))


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs and engines, unlike ``DataFrame.sample`` (seeded per-partition
    RNG, changes under repartitioning)."""
    hi = int(round(fraction * N_BUCKETS))
    return df.where(hash_bucket_col(F.col(key_col), salt) < F.lit(hi))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key hash
    falls under its stratum's rate — the data-mixing primitive
    ("upsample purchases, downsample views") with the same
    rerun/engine/partitioning stability as :func:`deterministic_sample`.

    Scan-side: the predicate is a pure expression over (stratum, key),
    so Catalyst evaluates it in the scan stage and the dropped rows
    never materialize. Strata absent from ``rates`` get
    ``default_rate``."""
    bucket = hash_bucket_col(F.col(key_col), salt)
    thresh = None
    for value, rate in rates.items():
        hi = F.lit(int(round(rate * N_BUCKETS)))
        cond = F.col(stratum_col) == value
        thresh = F.when(cond, hi) if thresh is None else thresh.when(cond, hi)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_rate * N_BUCKETS))))
        if thresh is not None
        else F.lit(int(round(default_rate * N_BUCKETS)))
    )
    return df.where(bucket < thresh)


def select_within_token_budget(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    quality_col: str = "quality",
    id_col: str = "doc_id",
    group_cols: tuple = ("lang",),
    num_shards: int | None = None,
) -> DataFrame:
    """Greedy corpus selection under a token budget: within each group,
    take documents in (quality DESC, id ASC) order while the running
    token total stays within ``budget`` — the standard data-mixing step
    "best N tokens per language". A doc that would cross the budget is
    excluded (its successors too: the order is the contract, not a
    knapsack fit).

    Two-pass distributed prefix sum per group (parallel across groups
    AND across shards within a group — see :mod:`prefixsum`; no single
    task ever sorts a whole group); deterministic because the sort key
    (quality, id) is total."""
    from v3io_tsdb_spark.functions.prefixsum import ordered_prefix_sum

    out = ordered_prefix_sum(
        df,
        tokens_col,
        [(quality_col, True), (id_col, False)],
        group_cols,
        "cum_tokens",
        num_shards=num_shards,
    )
    return out.where(F.col("cum_tokens") <= F.lit(budget))


def top_n_per_group(
    df: DataFrame,
    n: int,
    order_col: str = "quality",
    id_col: str = "doc_id",
    group_cols: tuple = ("lang",),
    safety: float = 4.0,
) -> DataFrame:
    """Scale-safe "best N rows per group" (the data-curation staple
    "top N docs per language by quality"), without ever sorting a
    whole group on one task.

    A plain ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    ships each group to a single task — the same 100 TB failure mode
    the prefix sums had. Instead: (1) one map-side-combinable
    aggregate computes each group's row count and its ``order_col``
    quantiles at a fixed fraction ladder; (2) the broadcast-joined
    threshold keeps only rows at/above the HIGHEST ladder quantile
    that still provably retains >= ``safety*n`` rows — provable via
    the Greenwald-Khanna bound (rank error <= rows/accuracy), so the
    filter can never cut into the true top N; (3) the exact window
    rank runs on the small survivor set. The result is therefore
    EXACTLY the true top N (ties broken by ``id_col``); the quantile
    prefilter only discards rows that cannot be in it. Groups too
    small for any ladder rung keep all rows (threshold -inf).
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    fracs = [0.0, 0.5, 0.75, 0.9, 0.99, 0.999, 0.9999]
    acc = 10_000  # GK sketch accuracy: rank error <= count/acc
    q = df.groupBy(*gcols).agg(
        F.count("*").alias("_tg_cnt"),
        F.percentile_approx(F.col(order_col).cast("double"), fracs, acc).alias("_tg_qs"),
    )
    pick = F.lit(float("-inf"))
    for i, p in enumerate(fracs):
        # rows kept by quantile p: >= cnt*(1-p) - cnt/acc (GK bound);
        # usable iff that lower bound still covers safety*n rows
        kept_lb = F.col("_tg_cnt") * F.lit(1.0 - p) - F.col("_tg_cnt") / F.lit(acc)
        pick = F.when(kept_lb >= F.lit(float(safety) * n), F.element_at("_tg_qs", i + 1)).otherwise(pick)
    thr = q.select(*gcols, pick.alias("_tg_thr"))
    survivors = df.join(F.broadcast(thr), gcols).where(
        F.col(order_col).cast("double") >= F.col("_tg_thr")
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .drop("_tg_thr")
    )


def mixture_sample(
    df: DataFrame,
    alpha: float = 0.5,
    top_rate: float = 0.25,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled source mixing: the data-mixing step that
    rebalances a multi-source corpus before training. The LARGEST
    source is kept at ``top_rate``; every other source s is kept at
    ``min(1, top_rate * (n_max / n_s)^(1-alpha))`` — alpha=1 preserves
    natural proportions, alpha=0 equalizes sources (up to the rate cap),
    alpha=0.5 is the standard square-root temperature.

    Engine-determinism is part of the contract, so the math avoids
    floating-point summation entirely: each source's rate depends only
    on the exact integers (n_s, n_max) through one ``pow`` — identical
    IEEE doubles on any engine — and membership is the same md5-bucket
    predicate as :func:`deterministic_sample` against the per-source
    integer threshold.

    Scale shape: one tiny count aggregate (map-side combinable), its
    max, and a broadcast join of the per-source thresholds back onto
    the scan — the data itself is never shuffled.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    nmax = counts.agg(F.max("_n").alias("_nmax"))
    base = counts.crossJoin(F.broadcast(nmax))
    ratio = F.col("_nmax") / F.col("_n")
    # the temperature power avoids libm pow (not correctly rounded,
    # differs per engine build — the detmath class): sqrt IS an IEEE
    # correctly-rounded primitive, so the standard alpha=0.5 case is
    # exact everywhere; other alphas route through det_exp/det_ln on
    # this panel-sized per-source frame
    expnt = 1.0 - alpha
    if expnt == 0.5:
        base = base.withColumn("_sc", F.sqrt(ratio))
    elif expnt == 0.0:
        base = base.withColumn("_sc", F.lit(1.0))
    elif expnt == 1.0:
        base = base.withColumn("_sc", ratio)
    else:
        from v3io_tsdb_spark.functions.detmath import (
            _sql_double, with_det_many,
        )

        # both ladders in ONE SELECT; the exp's input references the
        # ln's out as a lateral alias (identical arithmetic to
        # F.lit(expnt) * _lnr — the quoted-string cast IS how Spark
        # parses a correctly-rounded double literal)
        base = with_det_many(base, [
            ("ln", "_lnr", ratio, "_dl_"),
            ("exp", "_sc", f"{_sql_double(expnt)} * _lnr", "_de_"),
        ])
    rates = base.select(
        source_col,
        F.floor(
            F.least(F.lit(1.0), F.lit(top_rate) * F.col("_sc"))
            * F.lit(N_BUCKETS)
            + F.lit(1e-6)
        )
        .cast("long")
        .alias("_thr"),
    )
    out = df.join(F.broadcast(rates), source_col).where(
        hash_bucket_col(F.col(key_col), salt) < F.col("_thr")
    )
    return out.select(*df.columns)


def mixture_weights(
    df: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling/loss weights that reweight the corpus's
    NATURAL token distribution to a declared target mixture — the
    data-mixture planning step that precedes every large training run
    (the sibling of :func:`mixture_sample`, which rebalances by
    temperature instead of toward an explicit recipe): for source s,

        weight_s = target_share_s / actual_token_share_s

    so sampling (or loss-scaling) each source's examples by weight_s
    makes the expected token mix equal the target. weight > 1 means
    the source must be oversampled (epochs > 1 over that slice),
    weight < 1 undersampled, 0 excluded (absent from the target).

    Determinism contract: token counts are exact integers; the target
    shares are normalized IN PYTHON and injected as literals, so every
    output float is (python-literal x exact-int / exact-int) — the
    same IEEE doubles on any engine. Rounded at 6dp for hashing.

    100 TB posture: ONE map-side-combinable aggregate over
    (source -> count, token-sum); the per-source weight arithmetic is
    a literal CASE expression on the aggregate's ~|sources| rows plus
    a broadcast of the one-row grand total. The corpus itself is never
    shuffled and never joined.
    """
    from v3io_tsdb_spark.functions.text import token_count_col

    tot_target = sum(target.values())
    norm = {s: v / tot_target for s, v in target.items()}
    per_src = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col(F.col(text_col))).alias("n_tokens"),
    )
    total = per_src.agg(F.sum("n_tokens").alias("_total"))
    tshare = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(v))
            for s, v in sorted(norm.items())
        ],
        F.lit(0.0),
    ) if norm else F.lit(0.0)
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("n_tokens") / F.col("_total") + 1e-9, 6).alias(
                "actual_share"
            ),
            F.round(tshare + 1e-9, 6).alias("target_share"),
            F.round(
                tshare * F.col("_total") / F.col("n_tokens") + 1e-9, 6
            ).alias("weight"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int = 20,
    id_col: str = "doc_id",
    salt: str = "_ws",
) -> DataFrame:
    """Weighted sampling without replacement via hash-deterministic
    priorities (Efraimidis & Spirakis '06): each item gets a uniform
    ``u`` derived from md5(id), priority ``u^(1/w)`` — ordered here by
    the monotone log form ``ln(u)/w`` — and the top-``k`` priorities
    ARE a weight-proportional sample without replacement. The
    quality/length-weighted corpus draw every training mixture needs,
    with the repo's standard determinism contract: no RNG, stable
    across runs/engines/partitioning, reproducible by any SQL engine
    from the same md5 (the md5_int60 oracle trick).

    Zero-weight (or negative) items are excluded — they have no
    sampling mass. Plan: one scan computing the priority scan-side,
    one TakeOrdered (``orderBy().limit(k)`` — per-partition heaps,
    never a global sort); rank derives from the k-row result.

    Determinism boundary: the log-priority is rounded at 9 dp before
    ordering (ties break on id identically in both engines) — the
    same rounded-score-then-id rule as bm25/cosine/rrf.
    """
    from pyspark.sql import Window

    from v3io_tsdb_spark.functions.detmath import with_det_ln

    h = md5_int60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    u = (h + F.lit(1)) / F.lit(float((1 << 60) + 1))
    # det_ln (shared IEEE-only log) so the 9dp-rounded priority cannot
    # flip on a cross-libm ulp at a rounding boundary
    base = with_det_ln(df.where(F.col(weight_col) > 0), "_lnu", u)
    lk = F.round(F.col("_lnu") / F.col(weight_col) + F.lit(1e-12), 9)
    topk = (
        base.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            lk.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("priority"), F.col(id_col))
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", id_col, "weight", "priority")


def split_leakage(
    df: DataFrame,
    group_col: str,
    split_col_name: str = "split",
) -> DataFrame:
    """Group-leakage audit for a train/val/test split: a GROUP (user,
    session, patient, near-dup cluster) with rows in more than one
    split leaks training information into evaluation — the classic
    silent eval inflation. Row-level hash splits (X20's default keyed
    on a ROW id) guarantee this whenever groups span rows; the fix is
    keying ``assign_split`` on the GROUP id, and this operator is the
    audit that proves which one a dataset actually got.

    One row out: total rows/groups, leaky groups (spanning >1 split),
    rows belonging to leaky groups, and their fraction. Plan: one
    partial-aggregable groupBy to |groups| rows (the count_distinct
    is per-group over its own rows — no Expand, since there is one
    distinct aggregate), then a one-row reduce. Nothing data-sized
    moves twice.
    """
    per_group = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_rows"),
        F.count_distinct(F.col(split_col_name)).alias("_nsplits"),
    )
    leaky = (F.col("_nsplits") > 1).cast("long")
    out = per_group.agg(
        F.sum("_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(leaky).alias("n_leaky_groups"),
        F.sum(F.col("_rows") * leaky).alias("n_leaky_rows"),
    )
    frac = F.round(F.col("n_leaky_rows") / F.col("n_rows") + 1e-9, 6)
    return out.select(
        "n_rows", "n_groups", "n_leaky_groups", "n_leaky_rows",
        frac.alias("leak_frac"),
    )
