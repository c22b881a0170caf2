"""Grid alignment with interpolation — the engine's seek/interpolate operator.

Replicates the reference's per-cell collector semantics
(ref: pkg/pquerier/collector.go:236-338 downsampleRawData /
aggregateClientAggregatesCrossSeries; pkg/pquerier/interpolate.go:76-120):

For every grid cell time ``t`` (``from``-anchored, step-spaced) and
every series:

1. *Seek*: find the first sample at ``ts >= t``. If none exists the
   cell is omitted (the reference only fills a cell when Seek succeeds).
2. If that sample is exactly at ``t``, its value is used regardless of
   interpolation type (exact-match branch).
3. Otherwise apply the column's interpolation function with tolerance
   (default 2×step, ref: pkg/pquerier/select.go:41,421-424):
   - ``none``  → next sample's value, no tolerance check
   - ``nan``   → NaN
   - ``prev_val`` → previous sample's value if ``t − t_prev <= tol``
   - ``next_val`` → next sample's value if ``t_next − t <= tol``
   - ``linear``   → line between prev and next if both within tol
   Cells whose tolerance check fails are omitted.

The reference's cross-partition continuity (using the previous
partition's last point, collector.go:262-267) is automatic here: the
samples table is one logical DataFrame, so window functions see the
whole series.

Implementation: union the (tiny) per-series grid with the sample rows
and resolve prev/next via two window functions partitioned by
``series_id`` — one shuffle, sorted once, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from v3io_tsdb_spark.errors import BadRequest

INTERPOLATORS = ("none", "nan", "prev_val", "prev", "next_val", "next", "linear", "lin")

MAX_GRID_CELLS = 10_000_000


def _canon_interp(interp: str | None) -> str:
    s = (interp or "next_val").lower()
    if s in ("next", "next_val", ""):
        return "next_val"
    if s in ("prev", "prev_val"):
        return "prev_val"
    if s in ("lin", "linear"):
        return "linear"
    if s in ("none", "nan"):
        return s
    raise BadRequest(f"unknown interpolation function {interp!r}")


MAX_EXPLODE_FACTOR = 64


def align_to_grid(
    samples: DataFrame,
    from_ms: int,
    to_ms: int,
    step_ms: int,
    interp: str | None = "next_val",
    tolerance_ms: int | None = None,
    key_cols: tuple = ("name", "labels", "series_id"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Align each series onto the [from, to] step grid.

    Returns ``(key_cols..., t, value)`` with one row per non-omitted
    cell. ``samples`` may contain points outside [from, to] — they
    participate as prev/next neighbors, exactly like the reference's
    iterator spanning partitions.

    Two physical strategies with identical semantics:

    - **exploded** (``next_val``/``linear``, tolerance/step ≤ 64): each
      sample is exploded into the ≤(tol/step+1) cells it can serve as
      next (and prev, for linear) neighbor, then ONE
      ``groupBy(series, cell)`` picks the nearest candidates. One scan,
      one bounded shuffle, map-side combinable — survives a series with
      billions of points because nothing ever sorts a whole series.
      Valid because the tolerance check on the seek result ("first
      sample ≥ t, then ≤ tol away") equals "minimum of the candidates
      within tol": the global minimum is within tol iff any candidate
      is.
    - **windowed** (``prev_val``/``none``/``nan``, or huge tolerance):
      union the grid with the samples and resolve neighbors via two
      window functions. Needed when the Seek ("some sample ≥ t exists,
      however far") cannot be bounded by the tolerance.
    """
    interp = _canon_interp(interp)
    if tolerance_ms is None:
        tolerance_ms = 2 * step_ms  # ref: pkg/pquerier/select.go:41 (defaultToleranceFactor)
    n_cells = (to_ms - from_ms) // step_ms + 1
    if n_cells * 1.0 > MAX_GRID_CELLS:
        raise BadRequest(f"grid too large: {n_cells} cells (max {MAX_GRID_CELLS})")
    if (
        interp in ("next_val", "linear")
        and tolerance_ms // step_ms <= MAX_EXPLODE_FACTOR
    ):
        return _align_exploded(
            samples, from_ms, to_ms, step_ms, interp, tolerance_ms,
            key_cols, ts_col, value_col,
        )
    return _align_windowed(
        samples, from_ms, to_ms, step_ms, interp, tolerance_ms,
        key_cols, ts_col, value_col,
    )


def _align_exploded(
    samples, from_ms, to_ms, step_ms, interp, tolerance_ms, key_cols, ts_col, value_col
) -> DataFrame:
    keys = list(key_cols)
    n_cells = (to_ms - from_ms) // step_ms  # max cell index K
    # The role-array algebra below is emitted as SQL STRINGS (one
    # selectExpr payload): Column-by-Column construction of the same
    # tree costs ~1,800 py4j round-trips ≈ 0.5 s of driver latency per
    # build (measured on tsdb_interp_linear). Integer `/` in Spark SQL
    # is double division exactly like Column `/`, so every floor /
    # greatest / least lands on identical values.
    ET = "ARRAY<STRUCT<k: BIGINT, role: INT>>"
    a = f"(`{ts_col}` - {from_ms})"

    # cells this sample serves as NEXT neighbor (t <= ts, ts - t <= tol):
    # k ∈ [ceil((a - tol)/step), floor(a/step)]
    next_lo = f"greatest(0, -CAST(floor(({tolerance_ms} - {a}) / {step_ms}) AS BIGINT))"
    next_hi = f"least({n_cells}, CAST(floor({a} / {step_ms}) AS BIGINT))"
    roles = (
        f"CASE WHEN {next_lo} <= {next_hi} THEN "
        f"transform(sequence({next_lo}, {next_hi}), "
        f"k -> named_struct('k', k, 'role', 1)) "
        f"ELSE CAST(array() AS {ET}) END"
    )
    if interp == "linear":
        # cells this sample serves as PREV neighbor (t > ts, t - ts <= tol):
        # k ∈ [floor(a/step) + 1, floor((a + tol)/step)]
        prev_lo = f"greatest(0, CAST(floor({a} / {step_ms}) AS BIGINT) + 1)"
        prev_hi = f"least({n_cells}, CAST(floor(({a} + {tolerance_ms}) / {step_ms}) AS BIGINT))"
        prev_roles = (
            f"CASE WHEN {prev_lo} <= {prev_hi} THEN "
            f"transform(sequence({prev_lo}, {prev_hi}), "
            f"k -> named_struct('k', k, 'role', 0)) "
            f"ELSE CAST(array() AS {ET}) END"
        )
        roles = f"concat({roles}, {prev_roles})"

    # group on hashable keys; carry map-typed keys (labels) through the
    # group key as canonical strings — first(map) would force
    # SortAggregate (two extra sorts) instead of HashAggregate. The
    # map→string conversion happens BELOW the explode (once per sample,
    # not once per role row — a ×(2·tol/step) saving), and the map
    # column itself never enters the exploded projection.
    from v3io_tsdb_spark.labels import labels_map_col, labels_string_sql

    map_cols = {
        f.name for f in samples.schema.fields
        if f.dataType.typeName() == "map" and f.name in keys
    }
    hash_keys = [k for k in keys if k not in map_cols]
    exploded = samples.selectExpr(
        *[f"`{k}`" for k in hash_keys],
        *[f"{labels_string_sql(c)} AS `_mstr_{c}`" for c in map_cols],
        f"`{ts_col}` AS _ts",
        f"`{value_col}` AS _v",
        f"explode({roles}) AS _r",
    ).selectExpr(
        *[f"`{k}`" for k in hash_keys],
        *[f"`_mstr_{c}`" for c in map_cols],
        "_ts", "_v", "_r.k AS _k", "_r.role AS _role",
    )
    cells = exploded.groupBy(*hash_keys, *[f"_mstr_{c}" for c in map_cols], "_k").agg(
        F.expr("min(CASE WHEN _role = 1 THEN _ts END)").alias("_next_t"),
        F.expr("min_by(_v, CASE WHEN _role = 1 THEN _ts END)").alias("_next_v"),
        F.expr("max(CASE WHEN _role = 0 THEN _ts END)").alias("_prev_t"),
        F.expr("max_by(_v, CASE WHEN _role = 0 THEN _ts END)").alias("_prev_v"),
    )
    for c in map_cols:
        cells = cells.withColumn(c, labels_map_col(F.col(f"_mstr_{c}"))).drop(f"_mstr_{c}")
    t = (F.lit(from_ms) + F.col("_k") * F.lit(step_ms)).cast("long")
    cells = cells.withColumn("t", t)
    next_t, next_v = F.col("_next_t"), F.col("_next_v")
    prev_t, prev_v = F.col("_prev_t"), F.col("_prev_v")
    if interp == "next_val":
        value = next_v  # role bound already enforced the tolerance
    else:  # linear
        value = F.when(next_t == F.col("t"), next_v).otherwise(
            F.when(
                prev_t.isNotNull() & next_t.isNotNull(),
                prev_v + (next_v - prev_v) * (F.col("t") - prev_t) / (next_t - prev_t),
            )
        )
    return (
        cells.where(next_t.isNotNull())  # Seek must succeed
        .withColumn("value", value)
        .where(F.col("value").isNotNull())
        .select(*keys, "t", "value")
    )


def _align_windowed(
    samples, from_ms, to_ms, step_ms, interp, tolerance_ms, key_cols, ts_col, value_col
) -> DataFrame:

    keys = list(key_cols)
    pts = samples.select(
        *keys,
        F.col(ts_col).alias("t"),
        F.col(value_col).alias("_v"),
        F.lit(1).alias("_is_pt"),
    )
    # Distinct series list. Map-typed key columns (labels) can't be
    # grouped/distinct-ed in Spark — serialize them into the group key
    # (hash-aggregate friendly) and rebuild the maps after.
    from v3io_tsdb_spark.labels import labels_map_col, labels_string_col

    map_cols = {f.name for f in samples.schema.fields if f.dataType.typeName() == "map" and f.name in keys}
    hash_keys = [k for k in keys if k not in map_cols]
    if map_cols:
        ser = samples
        for c in map_cols:
            ser = ser.withColumn(f"_mstr_{c}", labels_string_col(F.col(c)))
        series = ser.select(*hash_keys, *[f"_mstr_{c}" for c in map_cols]).distinct()
        for c in map_cols:
            series = series.withColumn(c, labels_map_col(F.col(f"_mstr_{c}"))).drop(f"_mstr_{c}")
    else:
        series = samples.select(*keys).distinct()
    grid = (
        series
        .select(
            *keys,
            F.explode(
                F.sequence(F.lit(from_ms), F.lit(to_ms), F.lit(step_ms))
            ).alias("t"),
            F.lit(None).cast("double").alias("_v"),
            F.lit(0).alias("_is_pt"),
        )
    )
    u = pts.unionByName(grid)

    # At equal t the grid row sorts before the sample row, so "prev"
    # (frame ending before current) excludes a same-time sample while
    # "next" (frame from current on) includes it — matching Seek/PeakBack.
    order = [F.col("t"), F.col("_is_pt")]
    w_prev = Window.partitionBy("series_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.partitionBy("series_id").orderBy(*order).rowsBetween(0, Window.unboundedFollowing)

    pt_t = F.when(F.col("_is_pt") == 1, F.col("t"))
    cells = (
        u.withColumn("_prev_t", F.last(pt_t, ignorenulls=True).over(w_prev))
        .withColumn("_prev_v", F.last("_v", ignorenulls=True).over(w_prev))
        .withColumn("_next_t", F.first(pt_t, ignorenulls=True).over(w_next))
        .withColumn("_next_v", F.first("_v", ignorenulls=True).over(w_next))
        .where(F.col("_is_pt") == 0)
    )

    t, tol = F.col("t"), F.lit(tolerance_ms)
    prev_t, prev_v = F.col("_prev_t"), F.col("_prev_v")
    next_t, next_v = F.col("_next_t"), F.col("_next_v")

    if interp == "none":
        interped: Column = next_v
    elif interp == "nan":
        interped = F.lit(float("nan"))
    elif interp == "prev_val":
        interped = F.when(prev_t.isNotNull() & ((t - prev_t) <= tol), prev_v)
    elif interp == "next_val":
        interped = F.when((next_t - t) <= tol, next_v)
    else:  # linear
        interped = F.when(
            prev_t.isNotNull() & ((t - prev_t) <= tol) & ((next_t - t) <= tol),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        )

    value = F.when(next_t == t, next_v).otherwise(interped)
    out = (
        cells.where(next_t.isNotNull())  # Seek must succeed
        .withColumn("value", value)
        .where(F.col("value").isNotNull())
        .select(*keys, "t", "value")
    )
    return out


def minmax_decimate(
    df: DataFrame,
    series_cols: tuple = ("name", "uid"),
    ts_col: str = "t",
    value_col: str = "value",
    step_ms: int = 3_600_000,
    from_ms: int = 0,
) -> DataFrame:
    """Min/max downsampling for plotting: per (series, bucket), the
    actual sample achieving the bucket minimum and the one achieving
    the maximum, with their true timestamps — the classic envelope
    decimation every charting stack ships (e.g. Grafana/Timescale
    unstable-signal rendering; LTTB's simpler sibling that, unlike
    mean-downsampling A11, can NEVER hide a spike: the extreme point
    itself survives, at its real position).

    Ties on value resolve to the earliest timestamp (min_by/max_by on
    a (value, ts) struct) so both engines pick identically.

    Output: one row per (series, bucket): ``count``, ``min_v``/
    ``min_ts``, ``max_v``/``max_ts``. Exactly ≤2 points per bucket
    regardless of input density — the plot payload is panel-sized.
    Plan: ONE partial-aggregable (series, bucket) shuffle; min_by/
    max_by fold map-side like any other aggregate pair.
    """
    t = (
        F.lit(from_ms)
        + F.floor((F.col(ts_col) - from_ms) / step_ms) * step_ms
    ).cast("long")
    v = F.col(value_col)
    lo = F.min_by(F.struct(v.alias("v"), F.col(ts_col).alias("t")),
                  F.struct(v, F.col(ts_col)))
    hi = F.max_by(F.struct(v.alias("v"), F.col(ts_col).alias("t")),
                  F.struct(v, (-F.col(ts_col)).alias("_nt")))
    return (
        df.groupBy(*series_cols, t.alias("t"))
        .agg(
            F.count(value_col).cast("long").alias("count"),
            lo.alias("_lo"),
            hi.alias("_hi"),
        )
        .select(
            *series_cols,
            "t",
            "count",
            F.col("_lo.v").alias("min_v"),
            F.col("_lo.t").alias("min_ts"),
            F.col("_hi.v").alias("max_v"),
            F.col("_hi.t").alias("max_ts"),
        )
    )
