"""Query engine — Select over the samples (and rollup) tables.

This is the Spark-first re-expression of the reference's query
lifecycle (ref: pkg/pquerier/querier.go:128-206 baseSelectQry;
pkg/pquerier/select.go:70-135): validation and time-range resolution,
a small planner choosing the rollup ("server aggregates") path vs the
raw ("client aggregates") path, then ONE lazy DataFrame whose physical
execution (scan pushdown, partial aggregation, shuffle, codegen) is
left to Catalyst/Tungsten — replacing the reference's worker channels
and collector goroutines.

Result shapes (long-format; see operators.frames.to_wide_frame for the
columnar view):

- raw:           (name, labels, series_id, t, value)
- downsample:    (name, labels, series_id, t, value)
- aggregate:     (name, labels, series_id, t, <func>...)
- group_by:      (name, <label>..., t, <func>...)
- cross-series:  (name, t, <func>...)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from v3io_tsdb_spark.config import TSDBConfig
from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.labels import labels_map_col, labels_string_col, series_id_col
from v3io_tsdb_spark.operators import aggregates as agg
from v3io_tsdb_spark.operators.bucketing import sliding_bucket_ids, tumbling_bucket
from v3io_tsdb_spark.operators.interpolate import align_to_grid
from v3io_tsdb_spark.sql.filters import translate_filter
from v3io_tsdb_spark.timeutils import get_time_range, str2duration_ms


def _group_keeping_labels(df: DataFrame, keys: list, aggs: list) -> DataFrame:
    """groupBy that carries the ``labels`` map through as a serialized
    group-key string (functionally dependent on series_id, so groups are
    unchanged) instead of ``first(labels)`` — a map-typed aggregate
    forces SortAggregate (two extra sorts); a string key keeps
    HashAggregate."""
    d = df.withColumn("_lstr", labels_string_col(F.col("labels")))
    g = d.groupBy(*keys, "_lstr").agg(*aggs)
    return g.withColumn("labels", labels_map_col(F.col("_lstr"))).drop("_lstr")


def _rollup_combine_exprs() -> dict:
    """Mergeable-aggregate algebra for combining rollup partials into
    query cells (ref: pkg/aggregate/functions.go:48-79)."""
    return {
        "count": F.sum("count"),
        "sum": F.sum("sum"),
        "sqr": F.sum("sqr"),
        "min": F.min("min"),
        "max": F.max("max"),
        "last": F.max_by("last", "last_ts"),
    }


@dataclass
class RequestedColumn:
    """A requested output column (ref: pkg/pquerier/types.go:56-92)."""

    metric: str
    function: str = ""
    interpolator: str = ""
    tolerance: str | int | None = None
    alias: str = ""


@dataclass
class SelectParams:
    """Query parameters (ref: pkg/pquerier/querier.go:60-96 SelectParams)."""

    name: str | None = None  # comma-separated metric names; None/'' = all
    functions: str | None = None  # e.g. "sum,max" or "sum_all"
    step: str | int = 0
    from_time: object = None
    to_time: object = None
    filter: str | None = None  # v3io filter dialect or Spark SQL predicate
    group_by: str | None = None  # comma-separated label names
    aggregation_window: str | int = 0
    interpolator: str = ""  # for downsample / cross-series alignment
    tolerance: str | int | None = None
    use_only_client_aggr: bool = False
    # None → inherit TSDBConfig.disable_client_aggr
    disable_client_aggr: bool | None = None
    columns: list = field(default_factory=list)  # list[RequestedColumn]
    # v1 overlapping windows: aggregate the last w×step for each w
    # (ref: pkg/querier/querier.go:99-115 SelectOverlap)
    overlapping_windows: list = field(default_factory=list)


class Querier:
    """Query facade over a samples DataFrame/path and optional rollup.

    ref: pkg/pquerier/querier.go:40-58 (NewV3ioQuerier).
    """

    def __init__(
        self,
        spark: SparkSession,
        samples,
        rollup=None,
        config: TSDBConfig | None = None,
        label_rollups: dict | None = None,
        catalog: dict | None = None,
    ):
        self.spark = spark
        self.config = config or TSDBConfig()
        self._samples = samples
        self._rollup = rollup
        # cross-label pre-aggregates: {(label, ...): DataFrame|path}
        # (ref: pkg/appender/appender.go:220-231, select.go:261-283)
        self._label_rollups = {
            tuple(sorted(k)): v for k, v in (label_rollups or {}).items()
        }
        # names catalog {name: [label keys]} — metadata lookups (label
        # existence) answered without a Spark job when provided
        # (ref: pkg/appender/store.go:190-203 names directory)
        self._catalog = catalog

    # -- inputs ------------------------------------------------------------

    def samples_df(self) -> DataFrame:
        df = self._samples
        if isinstance(df, str):
            import glob
            import os

            if not glob.glob(os.path.join(df, "dt=*")):
                # a fully-deleted (or never-written) table: the
                # reference returns an empty result set for a query
                # over an empty TSDB, not an error — build an empty
                # frame on the canonical on-disk schema instead of
                # letting Parquet schema inference raise
                # (ref: pkg/pquerier/querier.go Select over empty
                # partitions yields an empty iterator)
                from pyspark.sql import types as T

                from v3io_tsdb_spark.appender import _INPUT_SCHEMA

                schema = T.StructType(
                    list(_INPUT_SCHEMA.fields)
                    + [T.StructField("series_id", T.LongType()),
                       T.StructField("dt", T.StringType())]
                )
                df = self.spark.createDataFrame([], schema)
            else:
                df = self.spark.read.parquet(df)
        if "series_id" not in df.columns:
            df = df.withColumn("series_id", series_id_col(F.col("name"), F.col("labels")))
        return df

    def rollup_df(self) -> DataFrame | None:
        if self._rollup is None:
            return None
        if isinstance(self._rollup, str):
            return self.spark.read.parquet(self._rollup)
        return self._rollup

    def label_rollup_df(self, subset) -> DataFrame | None:
        v = self._label_rollups.get(tuple(sorted(subset)))
        if isinstance(v, str):
            return self.spark.read.parquet(v)
        return v

    # -- public API --------------------------------------------------------

    def label_values(self, label_key: str, filter: str | None = None) -> DataFrame:
        """Distinct values of one label key, one ``value`` column
        (ref: pkg/pquerier/querier.go:215-317 LabelValues).

        ``__name__`` dispatches to metric names, mirroring the
        reference's special case (querier.go:217-219, where it reads
        the names directory). Otherwise a column-pruned distinct: the
        scan reads only the labels column (plus filter columns), and
        the distinct is a map-side-combinable aggregate — the
        reference's per-item label-string parse loop becomes one hash
        aggregate."""
        df = self.samples_df()
        if filter:
            df = df.where(F.expr(translate_filter(filter)))
        if label_key == "__name__":
            return df.select(F.col("name").alias("value")).distinct()
        return (
            df.select(F.col("labels")[label_key].alias("value"))
            .where(F.col("value").isNotNull())
            .distinct()
        )

    def label_names(self, filter: str | None = None) -> DataFrame:
        """Distinct label KEYS across all series, one ``name`` column.

        The reference declares this API but stubs it to nil
        (ref: pkg/pquerier/querier.go:227-229); here it is real —
        explode the pruned labels-keys array, distinct, done."""
        df = self.samples_df()
        if filter:
            df = df.where(F.expr(translate_filter(filter)))
        return (
            df.select(F.explode(F.map_keys(F.col("labels"))).alias("name"))
            .distinct()
        )

    def get_label_sets(self, metric: str | None = None, filter: str | None = None) -> DataFrame:
        """All distinct label sets, with the metric name carried as the
        ``__name__`` label (ref: pkg/pquerier/querier.go:320-378
        GetLabelSets; name-into-labels per the reference's expected
        output in pqueriertest/get_labelsets_integration_test.go:97-99).

        Returns ``(name, labels_str, labels)`` — distinct computed on
        the canonical sorted string (Spark cannot hash a map), map
        reconstructed after. The reference scans only the LAST TWO
        partitions as a performance concession; here the distinct is a
        partial-aggregate over two pruned columns, so the exact full
        range costs less than the concession saved."""
        from v3io_tsdb_spark.labels import labels_map_col, labels_string_col

        df = self.samples_df()
        if metric:
            names = [m.strip() for m in metric.split(",") if m.strip()]
            df = df.where(F.col("name").isin(names))
        if filter:
            df = df.where(F.expr(translate_filter(filter)))
        sets = df.select(
            "name", labels_string_col(F.col("labels")).alias("labels_str")
        ).distinct()
        return sets.withColumn(
            "labels",
            F.map_concat(
                labels_map_col(F.col("labels_str")),
                F.create_map(F.lit("__name__"), F.col("name")),
            ),
        )

    def select(self, params: SelectParams | None = None, **kwargs) -> DataFrame:
        """Build the lazy DataFrame for a select query."""
        if params is None:
            params = SelectParams(**kwargs)
        # duplicate (metric, function) column specs are an error, as in
        # the reference's createColumnSpecs (ref: pkg/pquerier/
        # selectQueryContext_test.go TestNegativeCreateColumnSpecs —
        # including whitespace variants like "count" vs "  count ")
        seen_cols: set = set()
        for c in params.columns or []:
            key = (c.metric, (c.function or "").strip().lower())
            if key in seen_cols:
                raise BadRequest(
                    f"column {key[1] or 'raw'}({key[0]}) requested more than once"
                )
            seen_cols.add(key)
        from_ms, to_ms = get_time_range(params.from_time, params.to_time)
        step_ms = str2duration_ms(params.step or 0)
        window_ms = str2duration_ms(params.aggregation_window or 0)
        funcs, cross_series = agg.parse_functions(params.functions)
        # column-spec functions JOIN the executed set (ref:
        # pkg/pquerier/select.go:177-181 metricsAggregatesToString — the
        # reference builds each metric's aggregation from its column
        # specs, not from a global list). Routing and execution must see
        # the same functions; unrequested (metric, function) cells are
        # masked after aggregation so each metric only answers its own
        # requested columns.
        # ordered-unique: the same function on DIFFERENT metrics is legal
        # (cpu count + disk count); parse_functions rejects literal dups
        col_funcs = ",".join(dict.fromkeys(
            f.strip().lower()
            for c in (params.columns or []) if c.function
            for f in c.function.split(",") if f.strip()
        ))
        if col_funcs:
            merged, col_cross = agg.parse_functions(col_funcs)
            funcs += [f for f in merged if f not in funcs]
            cross_series = cross_series or col_cross
        group_by = [g.strip() for g in (params.group_by or "").split(",") if g.strip()]

        # DisableClientAggr routing (ref: pkg/pquerier/select.go:183-256):
        # clamp the step to the rollup granularity (results can only come
        # at rollup resolution when the client may not re-aggregate) ...
        dca = self._dca(params)
        if funcs and dca and step_ms > self.config.granularity_ms:
            step_ms = self.config.granularity_ms

        base = self._scan(params, from_ms, to_ms, window_ms)

        if params.overlapping_windows:
            return self._overlapping(base, params, funcs, from_ms, to_ms, step_ms)
        # ... and fall back to ALL-raw when any requested metric cannot be
        # served from rollups (cross-series, uncovered functions, fine
        # steps) — a query must never silently mix exact and rolled-up
        # answers per metric (ref: select.go:228-256 forceRawQuery)
        if funcs and dca and self._force_raw(params, funcs, cross_series, step_ms, window_ms):
            return self._raw(base)
        if funcs and cross_series:
            return self._cross_series(base, params, funcs, from_ms, to_ms, step_ms, group_by)
        # column specs may MIX aggregate and raw columns: a
        # function-less RequestedColumn next to function'd ones (with no
        # bare ``functions`` param) asks for its metric's interpolated
        # downsample alongside the aggregates — one series per requested
        # column in the reference (ref: pkg/pquerier/select.go:177-181;
        # golden: pqueriertest/server_aggregates_integration_test.go:
        # 292-347 sum + next_val raw column in one select)
        raw_cols = [c for c in (params.columns or []) if not c.function]
        if (
            funcs and raw_cols and step_ms and not params.functions
            and not group_by and not window_ms
        ):
            return self._mixed_agg_raw(base, params, funcs, from_ms, to_ms, step_ms)
        if funcs:
            res = self._aggregate(base, params, funcs, from_ms, to_ms, step_ms, window_ms, group_by)
            return self._mask_unrequested(res, params, funcs)
        if step_ms:
            return self._downsample(base, params, from_ms, to_ms, step_ms)
        return self._raw(base)

    def _dca(self, params: SelectParams) -> bool:
        if params.disable_client_aggr is not None:
            return params.disable_client_aggr
        return self.config.disable_client_aggr

    @staticmethod
    def _metric_interp(params: SelectParams) -> dict:
        """Per-metric interpolator inheritance: a column WITHOUT an
        explicit interpolator inherits the one any sibling column of
        the SAME metric declared (ref: pkg/pquerier/
        selectQueryContext_test.go TestCreateColumnSpecs — "cpu sum
        linear + cpu count" ⇒ count is linear too; first declared
        wins)."""
        per: dict = {}
        for c in params.columns or []:
            if c.interpolator and c.metric not in per:
                per[c.metric] = c.interpolator
        return per

    def _per_metric_funcs(self, params: SelectParams, funcs: list) -> dict:
        """Requested functions per metric: column specs may request
        different functions for different metrics; bare ``functions``
        applies to every requested metric (ref:
        pkg/pquerier/select.go:177-179 metricsAggregatesToString)."""
        per = {}
        for c in params.columns or []:
            fs = per.setdefault(c.metric, [])
            if c.function and c.function not in fs:
                fs.append(c.function)
        if not per:
            for m in self._requested_names(params) or [None]:
                per[m] = list(funcs)
        return per

    def _mask_unrequested(self, res: DataFrame, params: SelectParams, funcs: list) -> DataFrame:
        """With per-column functions, a metric answers ONLY its own
        requested functions — other function cells become NULL, the
        DataFrame analog of the reference emitting one series per
        requested column (ref: pkg/pquerier/select.go:177-181). A column
        spec without a function inherits the bare ``functions`` list."""
        if not any(c.function for c in params.columns or []):
            return res
        bare = agg.parse_functions(params.functions)[0]
        per: dict = {}
        wild: set = set()
        for c in params.columns:
            fs_req = agg.parse_functions(c.function)[0] if c.function else bare
            if c.metric == "*":
                # function-over-wildcard is a column TEMPLATE applying to
                # every metric in the response (ref: pkg/pquerier/
                # sql_parser.go:77-80, frames.go:160-165 columnsTemplates;
                # golden: query_sql_integration_test.go:293-347
                # "select max(*), min(cpu)")
                wild.update(fs_req)
                continue
            fs = per.setdefault(c.metric, [])
            for f in fs_req:
                if f not in fs:
                    fs.append(f)
        for f in funcs:
            if f in wild:
                continue
            allowed = [m for m, fs in per.items() if f in fs]
            res = res.withColumn(f, F.when(F.col("name").isin(allowed), F.col(f)))
        return res

    def _force_raw(
        self, params: SelectParams, funcs, cross_series: bool, step_ms: int, window_ms: int
    ) -> bool:
        """With client aggregation disabled, serve raw data unless EVERY
        requested metric can be answered from the rollup (cross-series
        aggregates never can). Mixed capability forces all-raw rather
        than mixing per-metric plans (ref: select.go:228-256)."""
        if cross_series:
            return True
        if self.rollup_df() is None:
            return True
        caps = [
            bool(fs) and self._rollup_step_ok(fs, step_ms, window_ms, params)
            for fs in self._per_metric_funcs(params, funcs).values()
        ]
        return not all(caps)

    def _overlapping(self, base, params, funcs, from_ms, to_ms, step_ms) -> DataFrame:
        """Overlapping windows: one aggregate cell per window w covering
        (maxAligned − w·step, maxAligned), maxAligned = ⌊to/step⌋·step.
        Strict bounds replicate the v1 collector
        (ref: pkg/querier/seriesset.go:187-217 chunks2WindowedAggregates,
        pkg/aggregate/iterator.go:149-171).
        """
        if not funcs:
            raise BadRequest("overlapping windows require aggregate functions")
        if not step_ms:
            raise BadRequest("overlapping windows require a step")
        windows = sorted({int(w) for w in params.overlapping_windows}, reverse=True)
        max_aligned = (to_ms // step_ms) * step_ms
        wins = F.array(*[F.lit(w) for w in windows])
        b = (
            base.where(F.col("value").isNotNull())
            .where(F.col("ts") < F.lit(max_aligned))
            .withColumn("window", F.explode(wins))
            .where(F.col("ts") > F.lit(max_aligned) - F.col("window") * F.lit(step_ms))
        )
        raws = agg.required_raw(funcs)
        grouped = _group_keeping_labels(
            b, ["name", "series_id", "window"], agg.raw_agg_exprs(raws)
        )
        out = grouped.withColumn("t", F.lit(max_aligned) - F.col("window") * F.lit(step_ms))
        for f in funcs:
            if f in ("avg", "stddev", "stdvar"):
                out = out.withColumn(f, agg.derived_col(f, step_ms))
        if "rate" in funcs:
            raise BadRequest("rate is not defined for overlapping windows")
        return out.select(
            "name", "labels", "series_id", "window", "t", *[F.col(f).alias(f) for f in funcs]
        )

    # -- scan --------------------------------------------------------------

    def _scan(self, params: SelectParams, from_ms: int, to_ms: int, window_ms: int) -> DataFrame:
        """Time/name/filter-pruned scan.

        The time-range predicate reaches the Parquet scan (plus ``dt``
        partition pruning when present); this is the analog of the
        reference's partition pruning + attribute projection
        (ref: pkg/pquerier/querier.go:195-206, select.go:583-606).
        """
        df = self.samples_df()
        lo = from_ms - window_ms  # ref: PartsForRange(from - aggWindow, to)
        df = df.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(to_ms)))
        # When the source keeps its native timestamp column alongside the
        # derived ms one (events feed), mirror the clamp onto it: a plain
        # column predicate reaches the Parquet scan (PushedFilters) where
        # the derived-ms predicate cannot. ts_ms = ns div 1e6, so
        # ts_ms ∈ [lo, to]  ⟺  ns ∈ [lo·1e6, (to+1)·1e6).
        if "_ts_raw_ns" in df.columns:
            df = df.where(
                (F.col("_ts_raw_ns") >= F.lit(lo * 1_000_000))
                & (F.col("_ts_raw_ns") < F.lit((to_ms + 1) * 1_000_000))
            )
        elif "_ts_raw_ts" in df.columns:
            df = df.where(
                (F.col("_ts_raw_ts") >= F.timestamp_millis(F.lit(lo)))
                & (F.col("_ts_raw_ts") < F.timestamp_millis(F.lit(to_ms + 1)))
            )
        if "dt" in df.columns:
            lo_dt = F.date_format(F.timestamp_millis(F.lit(lo)), "yyyy-MM-dd")
            hi_dt = F.date_format(F.timestamp_millis(F.lit(to_ms)), "yyyy-MM-dd")
            df = df.where(F.col("dt").between(lo_dt, hi_dt))
        names = self._requested_names(params)
        if names:
            # name-equality fast path → partition/row-group pruning
            # (ref: pkg/pquerier/select.go:579-581 sharding-key range scan)
            df = df.where(F.col("name").isin(names))
        if params.filter:
            df = df.where(F.expr(translate_filter(params.filter)))
        return df

    def _requested_names(self, params: SelectParams) -> list[str]:
        """Empty list = unbounded (all metrics). A ``*`` column — raw
        wildcard or a function-over-wildcard template (ref:
        pkg/pquerier/sql_parser.go:77-80) — widens the response to
        every metric, so no name filter may apply."""
        names = []
        if params.name:
            names += [n.strip() for n in str(params.name).split(",") if n.strip()]
        for c in params.columns or []:
            if c.metric == "*":
                return []
            if c.metric and c.metric not in names:
                names.append(c.metric)
        return names

    # -- paths -------------------------------------------------------------

    def _raw(self, base: DataFrame) -> DataFrame:
        """Raw samples; variant metrics ride along in their typed
        columns (ref: pkg/chunkenc/vartype.go — a series is float XOR
        one variant kind, so exactly one value column is non-null per
        row; unrequested kinds prune out of the Parquet scan)."""
        from v3io_tsdb_spark.appender import VARIANT_COLS

        cols = ["name", "labels", "series_id", F.col("ts").alias("t"), "value"]
        cols += [c for c, _ in VARIANT_COLS if c in base.columns]
        return base.select(*cols)

    def _mixed_agg_raw(self, base, params, funcs, from_ms, to_ms, step_ms) -> DataFrame:
        """Aggregate columns + function-less raw columns in ONE select:
        aggregates answer their functions, each function-less column
        contributes its metric's downsample (per-column interpolator/
        tolerance) on the same step grid, full-outer joined into one
        frame — the DataFrame analog of the reference emitting one
        series per requested column."""
        from v3io_tsdb_spark.operators.interpolate import align_to_grid

        agg_res = self._aggregate(base, params, funcs, from_ms, to_ms, step_ms, 0, [])
        agg_res = self._mask_unrequested(agg_res, params, funcs)
        metric_interp = self._metric_interp(params)
        parts = []
        for c in params.columns:
            if c.function:
                continue
            tol_src = c.tolerance if c.tolerance is not None else params.tolerance
            tol = str2duration_ms(tol_src) if tol_src else None
            src = base.where(
                (F.col("name") == c.metric) & F.col("value").isNotNull()
            )
            parts.append(
                align_to_grid(
                    src, from_ms, to_ms, step_ms,
                    interp=c.interpolator or metric_interp.get(c.metric)
                    or params.interpolator or "next_val",
                    tolerance_ms=tol,
                )
            )
        raw = parts[0]
        for p in parts[1:]:
            raw = raw.unionByName(p)
        keys = ["name", "series_id", "t"]
        left = agg_res.withColumnRenamed("labels", "_al")
        right = raw.withColumnRenamed("labels", "_rl")
        return (
            left.join(right, on=keys, how="full_outer")
            .withColumn("labels", F.coalesce(F.col("_al"), F.col("_rl")))
            .select("name", "labels", "series_id", "t", *funcs, "value")
        )

    def _downsample(self, base, params, from_ms, to_ms, step_ms) -> DataFrame:
        """Step without functions → per-cell seek+interpolate value
        (ref: pkg/pquerier/collector.go:236-281 downsampleRawData).
        With column specs, each column aligns with its own interpolator
        (sibling-inherited per metric, see _metric_interp); a bare
        query aligns everything with the query-level interpolator."""
        src = base.where(F.col("value").isNotNull())
        if params.columns:
            metric_interp = self._metric_interp(params)
            parts = []
            for c in params.columns:
                tol_src = c.tolerance if c.tolerance is not None else params.tolerance
                tol = str2duration_ms(tol_src) if tol_src else None
                parts.append(
                    align_to_grid(
                        src.where(F.col("name") == c.metric),
                        from_ms, to_ms, step_ms,
                        interp=c.interpolator or metric_interp.get(c.metric)
                        or params.interpolator or "next_val",
                        tolerance_ms=tol,
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        tol = str2duration_ms(params.tolerance) if params.tolerance else None
        return align_to_grid(
            src, from_ms, to_ms, step_ms,
            interp=params.interpolator or "next_val",
            tolerance_ms=tol,
        )

    def _group_keys(self, group_by: list[str]):
        """Label-subset grouping (ref: pkg/pquerier/select.go:354-367)."""
        return [F.element_at(F.col("labels"), g).alias(g) for g in group_by]

    def _validate_group_by(
        self, base: DataFrame, group_by: list[str], names: list | None = None
    ) -> None:
        """GroupBy on a nonexistent label is an error, as in the
        reference (ref: pkg/pquerier/select.go:354-367).

        With a names catalog, existence is a METADATA lookup — zero
        Spark jobs, the reference's names-directory behavior. The check
        is scoped to the REQUESTED metrics' label-key sets (the
        reference errors per queried series, not globally) — a label
        that exists only on an unqueried metric is still an error here.
        Without a catalog, existence is probed with ``limit(1)`` per
        label over the filtered query base: when the label exists (the
        common case) the scan short-circuits after the first matching
        chunk instead of aggregating the whole input."""
        if self._catalog is not None:
            known: set = set()
            # "*" = label keys carried by EVERY metric in this source
            # (a uniform-schema marker for feeds whose labels are fixed
            # by construction, e.g. datasets.events_as_samples builds
            # labels{uid} for every series) — metadata, not a scan
            known.update(self._catalog.get("*", ()))
            requested = [n for n in (names or []) if n in self._catalog]
            for ks in (
                (self._catalog[n] for n in requested)
                if requested
                else self._catalog.values()
            ):
                known.update(ks)
            missing = [g for g in group_by if g not in known]
            if missing:
                raise BadRequest(
                    f"group-by label {missing[0]!r} does not exist in the data"
                )
            return
        for g in group_by:
            probe = base.where(F.element_at(F.col("labels"), g).isNotNull()).limit(1)
            if probe.isEmpty():
                raise BadRequest(f"group-by label {g!r} does not exist in the data")

    def _aggregate(self, base, params, funcs, from_ms, to_ms, step_ms, window_ms, group_by) -> DataFrame:
        if not step_ms:
            step_ms = to_ms - from_ms or 1  # single bucket over the range
        if group_by:
            self._validate_group_by(base, group_by, self._requested_names(params))

        # router order mirrors the reference: a pre-aggregated label-set
        # table matching GroupBy wins over the per-series rollup
        # (ref: pkg/pquerier/select.go:261-283 parsePreAggregateLabels)
        lr = self._label_rollup_plan(funcs, step_ms, window_ms, params, group_by)
        if lr is not None:
            return self._aggregate_from_label_rollup(
                lr, params, funcs, from_ms, to_ms, step_ms, window_ms, group_by
            )
        use_rollup = self._can_use_rollup(funcs, step_ms, window_ms, params)
        if use_rollup:
            return self._aggregate_from_rollup(
                params, funcs, from_ms, to_ms, step_ms, window_ms, group_by
            )

        # numeric aggregates are float-only, but count covers EVERY
        # sample kind — a variant (string) series answers count like
        # the reference (ref: pqueriertest/variant_type_query_
        # integration_test.go:177-245); numeric aggs skip the nulls
        from v3io_tsdb_spark.appender import VARIANT_COLS

        presence = F.col("value").isNotNull()
        for vc, _ in VARIANT_COLS:
            if vc in base.columns:
                presence = presence | F.col(vc).isNotNull()
        base = base.where(presence)
        if window_ms:
            b = base.withColumn(
                "_buckets", sliding_bucket_ids(F.col("ts"), from_ms, to_ms, step_ms, window_ms)
            ).withColumn("t", F.explode("_buckets"))
        else:
            b = base.withColumn("t", tumbling_bucket(F.col("ts"), from_ms, step_ms)).where(
                F.col("t") <= F.lit(to_ms)
            )

        raws = agg.required_raw(funcs)
        agg_exprs = agg.raw_agg_exprs(raws, count_presence=F.lit(True))
        if group_by:
            keys = [F.col("name")] + self._group_keys(group_by) + [F.col("t")]
            grouped = b.groupBy(*keys).agg(*agg_exprs)
            part_keys = ["name"] + group_by
        else:
            grouped = _group_keeping_labels(
                b, ["name", "series_id", "t"], agg_exprs
            )
            part_keys = ["name", "series_id"]
        return self._finish_aggregate(grouped, funcs, raws, step_ms, part_keys, group_by)

    def _finish_aggregate(self, grouped, funcs, raws, step_ms, part_keys, group_by) -> DataFrame:
        """Derived columns + projection; empty buckets are naturally
        absent (count==0 suppression, ref: pkg/aggregate/iterator.go:361-364)."""
        out = grouped
        if "rate" in funcs:
            w = Window.partitionBy(*part_keys).orderBy("t")
            out = out.withColumn(
                "rate", agg.rate_col(F.col("last"), F.lag("last").over(w), step_ms)
            )
        for f in funcs:
            if f in ("avg", "stddev", "stdvar"):
                out = out.withColumn(f, agg.derived_col(f, step_ms))
        head = ["name"] + (group_by if group_by else ["labels", "series_id"]) + ["t"]
        existing = [c for c in head if c in out.columns]
        return out.select(*existing, *[F.col(f).alias(f) for f in funcs])

    def _cross_series(self, base, params, funcs, from_ms, to_ms, step_ms, group_by) -> DataFrame:
        """``*_all`` aggregation: align each series to the step grid
        with interpolation, then aggregate across series per bucket
        (ref: pkg/pquerier/collector.go:283-338).
        """
        if not step_ms:
            step_ms = to_ms - from_ms or 1
        if group_by:
            self._validate_group_by(base, group_by, self._requested_names(params))
        tol = str2duration_ms(params.tolerance) if params.tolerance else None
        aligned = align_to_grid(
            base.where(F.col("value").isNotNull()), from_ms, to_ms, step_ms,
            interp=params.interpolator or "next_val",
            tolerance_ms=tol,
        )
        raws = agg.required_raw(funcs)
        keys = [F.col("name")] + (self._group_keys_from_map(aligned, group_by) if group_by else []) + [F.col("t")]
        grouped = aligned.groupBy(*keys).agg(
            *agg.raw_agg_exprs(raws, value_col="value", ts_col="series_id")
        )
        part_keys = ["name"] + group_by
        out = grouped
        if "rate" in funcs:
            w = Window.partitionBy(*part_keys).orderBy("t")
            out = out.withColumn("rate", agg.rate_col(F.col("last"), F.lag("last").over(w), step_ms))
        for f in funcs:
            if f in ("avg", "stddev", "stdvar"):
                out = out.withColumn(f, agg.derived_col(f, step_ms))
        head = ["name"] + (group_by or []) + ["t"]
        return out.select(*head, *[F.col(f).alias(f) for f in funcs])

    def _group_keys_from_map(self, df, group_by):
        return [F.element_at(F.col("labels"), g).alias(g) for g in group_by]

    # -- rollup ("server aggregates") routing ------------------------------

    def _rollup_step_ok(self, funcs, step_ms, window_ms, params: SelectParams) -> bool:
        """Shared router predicate: aggregates covered by the rollup
        config AND step coarse enough —
        ``step / granularity > coefficient`` (default 3)
        (ref: pkg/aggregate/aggregationParams.go:67-77,
        pkg/pquerier/select.go:183-226).
        """
        if not funcs:
            return False
        if params.use_only_client_aggr or self.config.use_only_client_aggr:
            return False
        if self.config.use_precise_aggregations:
            # exact-results override: always aggregate from raw samples
            # (ref: pkg/config/config.go:172-173)
            return False
        gran = self.config.granularity_ms
        if window_ms and window_ms < gran:
            # CanAggregate: aggregationWindow must cover ≥ one rollup
            # bucket (ref: pkg/aggregate/aggregationParams.go:76-77)
            return False
        if "rate" in funcs:
            pass  # rate derives from 'last', which rollups carry
        needed = set(agg.required_raw(funcs))
        if not needed.issubset(set(self.config.aggregates)):
            return False
        if step_ms / gran > self.config.use_server_aggregate_coefficient:
            return True
        # step clamped to the granularity under DisableClientAggr still
        # qualifies (ref: aggregationParams.go:75)
        return step_ms == gran and self._dca(params)

    def _can_use_rollup(self, funcs, step_ms, window_ms, params: SelectParams) -> bool:
        """The ~100-line query router (SURVEY §4): use the materialized
        per-series rollup iff it exists and _rollup_step_ok holds."""
        if self.rollup_df() is None:
            return False
        return self._rollup_step_ok(funcs, step_ms, window_ms, params)

    def _label_rollup_plan(
        self, funcs, step_ms, window_ms, params: SelectParams, group_by
    ) -> DataFrame | None:
        """Choose a cross-label pre-aggregate table when GroupBy exactly
        matches a declared label subset and the filter only references
        those labels (ref: pkg/pquerier/select.go:261-283)."""
        if not group_by:
            return None
        r = self.label_rollup_df(group_by)
        if r is None or not self._rollup_step_ok(funcs, step_ms, window_ms, params):
            return None
        if params.filter:
            pred = translate_filter(params.filter)
            for g in group_by:
                pred = pred.replace(f"labels['{g}']", f"`{g}`")
            if "labels[" in pred:  # filter needs labels the table lacks
                return None
            r = r.where(F.expr(pred))
        return r

    def _rollup_cells(self, r, from_ms, to_ms, step_ms, window_ms) -> DataFrame:
        """Map rollup buckets to query cells by bucket **median** time.

        No window: truncating-division cell with a one-step inclusion
        margin (ref: pkg/pquerier/collector.go:210-234). With an
        aggregation window: each bucket contributes to every cell of the
        from-anchored grid whose window covers its median — round-up
        first cell, fan-out ``explode(sequence)`` when window > step
        (ref: collector.go:219-223 bottomMargin=window,
        collector.go:366-383 windowAggregationWithServerAggregates).
        """
        gran = self.config.granularity_ms
        median = F.col("bucket") + F.lit(gran // 2)
        bottom = window_ms if window_ms else step_ms
        r = r.where((median >= F.lit(from_ms - bottom)) & (median <= F.lit(to_ms + step_ms)))
        if not window_ms:
            cell = (
                F.expr(f"(bucket + {gran // 2} - {from_ms}) div {step_ms}") * F.lit(step_ms)
                + F.lit(from_ms)
            ).cast("long")
            r = r.withColumn("t", cell)
        elif window_ms > step_ms:
            r = (
                r.withColumn(
                    "_buckets", sliding_bucket_ids(median, from_ms, to_ms, step_ms, window_ms)
                )
                .withColumn("t", F.explode("_buckets"))
                .drop("_buckets")
            )
        else:
            # window <= step: round-up cell only (ref: collector.go:380-382)
            cell = (
                F.ceil((median - F.lit(from_ms)) / F.lit(step_ms)) * F.lit(step_ms)
                + F.lit(from_ms)
            ).cast("long")
            r = r.withColumn("t", cell)
        return r.where((F.col("t") >= F.lit(from_ms)) & (F.col("t") <= F.lit(to_ms)))

    def _aggregate_from_label_rollup(
        self, r, params, funcs, from_ms, to_ms, step_ms, window_ms, group_by
    ) -> DataFrame:
        """Same bucket→cell median mapping as the per-series rollup path,
        over a table already keyed by the label subset."""
        names = self._requested_names(params)
        if names:
            r = r.where(F.col("name").isin(names))
        r = self._rollup_cells(r, from_ms, to_ms, step_ms, window_ms)
        raws = agg.required_raw(funcs)
        combine = _rollup_combine_exprs()
        grouped = r.groupBy("name", *group_by, "t").agg(
            *[combine[x].alias(x) for x in raws]
        )
        return self._finish_aggregate(grouped, funcs, raws, step_ms, ["name"] + group_by, group_by)

    def _aggregate_from_rollup(
        self, params, funcs, from_ms, to_ms, step_ms, window_ms, group_by
    ) -> DataFrame:
        """Re-bucket rollup rows into query cells by bucket **median**
        time with truncating division, replicating the reference's
        mapping (ref: pkg/pquerier/collector.go:187-234
        aggregateServerAggregates); windowed cells via
        :meth:`_rollup_cells`.
        """
        r = self.rollup_df()
        names = self._requested_names(params)
        if names:
            r = r.where(F.col("name").isin(names))
        if params.filter:
            r = r.where(F.expr(translate_filter(params.filter)))
        r = self._rollup_cells(r, from_ms, to_ms, step_ms, window_ms)

        raws = agg.required_raw(funcs)
        combine = _rollup_combine_exprs()
        if group_by:
            keys = [F.col("name")] + self._group_keys_from_map(r, group_by) + [F.col("t")]
            grouped = r.groupBy(*keys).agg(*[combine[x].alias(x) for x in raws])
            part_keys = ["name"] + group_by
        else:
            grouped = _group_keeping_labels(
                r, ["name", "series_id", "t"], [combine[x].alias(x) for x in raws]
            )
            part_keys = ["name", "series_id"]
        return self._finish_aggregate(grouped, funcs, raws, step_ms, part_keys, group_by)
