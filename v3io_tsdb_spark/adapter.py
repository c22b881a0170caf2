"""TSDBAdapter — create / append / query / delete, the top-level API.

Mirrors the reference's V3ioAdapter surface
(ref: pkg/tsdb/v3iotsdb.go:80-120 CreateTSDB, 268-270 QuerierV2,
273-477 DeleteDB, 786-805 CountMetrics) on a Parquet-backed layout:

    <path>/_tsdb_schema.json      config (the ".schema" analog)
    <path>/samples/               long table, partitioned by dt
    <path>/rollup/                partial-aggregate log, partitioned by rdt
    <path>/rollup_by_<labels>/    optional cross-label pre-aggregates
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v3io_tsdb_spark import appender as app
from v3io_tsdb_spark import rollup as ru
from v3io_tsdb_spark.config import SCHEMA_FILE, TSDBConfig
from v3io_tsdb_spark.errors import BadRequest, SchemaError
from v3io_tsdb_spark.querier import Querier, SelectParams
from v3io_tsdb_spark.sql.filters import translate_filter
from v3io_tsdb_spark.timeutils import str2unix_ms


class TSDBAdapter:
    def __init__(self, spark: SparkSession, path: str, config: TSDBConfig | None = None):
        self.spark = spark
        self.path = path
        self.samples_path = os.path.join(path, "samples")
        self.rollup_path = os.path.join(path, "rollup")
        if config is None and os.path.exists(os.path.join(path, SCHEMA_FILE)):
            config = TSDBConfig.load(path)
        self.config = config or TSDBConfig()

    # -- lifecycle ---------------------------------------------------------

    def create(self, if_not_exists: bool = False) -> "TSDBAdapter":
        """ref: pkg/tsdb/v3iotsdb.go:80-120 (CreateTSDB)"""
        schema_file = os.path.join(self.path, SCHEMA_FILE)
        if os.path.exists(schema_file):
            if if_not_exists:
                return self
            raise SchemaError(f"TSDB already exists at {self.path}")
        self.config.save(self.path)
        return self

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, SCHEMA_FILE))

    def delete_db(self) -> None:
        """Delete-all (ref: pkg/tsdb/v3iotsdb.go:273-290 DeleteAll path)."""
        shutil.rmtree(self.path, ignore_errors=True)

    # -- ingest ------------------------------------------------------------

    def append(self, data, validate: bool = True, update_rollup: bool = True) -> None:
        """Batch append samples; maintains the rollup log.

        ref: pkg/appender/appender.go:194-287 + SURVEY §3.3 — the whole
        async pipeline becomes normalize → validate → write + rollup
        append.
        """
        df = app.normalize_samples(self.spark, data)
        if validate:
            app.validate_samples(df)
        out = app.prepare_for_write(df, self.config)
        out.write.mode("append").partitionBy("dt").parquet(self.samples_path)
        if update_rollup:
            # read back the deduped batch shape from the in-memory plan
            batch = out.drop("dt")
            partial = ru.build_rollup(batch, self.config.granularity_ms)
            partial = partial.withColumn(
                "rdt", F.date_format(F.timestamp_millis(F.col("bucket")), "yyyy-MM-dd")
            )
            partial.write.mode("append").partitionBy("rdt").parquet(self.rollup_path)
            for subset in self.config.pre_aggregates:
                p = ru.build_label_rollup(batch, self.config.granularity_ms, tuple(subset))
                p = p.withColumn(
                    "rdt", F.date_format(F.timestamp_millis(F.col("bucket")), "yyyy-MM-dd")
                )
                p.write.mode("append").partitionBy("rdt").parquet(self._label_rollup_path(subset))

    def _label_rollup_path(self, subset) -> str:
        return os.path.join(self.path, "rollup_by_" + "_".join(subset))

    def compact_rollup(self) -> None:
        """Merge partial rollup rows (optional maintenance)."""
        if not os.path.exists(self.rollup_path):
            return
        merged = ru.merge_partials(self.spark.read.parquet(self.rollup_path).drop("rdt"))
        merged = merged.withColumn(
            "rdt", F.date_format(F.timestamp_millis(F.col("bucket")), "yyyy-MM-dd")
        )
        tmp = self.rollup_path + "_compacting"
        merged.write.mode("overwrite").partitionBy("rdt").parquet(tmp)
        shutil.rmtree(self.rollup_path)
        os.rename(tmp, self.rollup_path)

    # -- query -------------------------------------------------------------

    def querier(self) -> Querier:
        rollup = self.rollup_path if os.path.exists(self.rollup_path) else None
        label_rollups = {
            tuple(subset): self._label_rollup_path(subset)
            for subset in self.config.pre_aggregates
            if os.path.exists(self._label_rollup_path(subset))
        }
        return Querier(
            self.spark, self.samples_path, rollup=rollup,
            config=self.config, label_rollups=label_rollups,
        )

    def select(self, params: SelectParams | None = None, **kwargs) -> DataFrame:
        return self.querier().select(params, **kwargs)

    # -- info --------------------------------------------------------------

    def count_metrics(self) -> int:
        """ref: pkg/tsdb/v3iotsdb.go:786-805 (CountMetrics)"""
        return self._samples().select("series_id").distinct().count()

    def metric_names(self) -> list:
        """ref: pkg/pquerier/querier.go:231-255 (getMetricNames)"""
        return [r["name"] for r in self._samples().select("name").distinct().orderBy("name").collect()]

    def _samples(self) -> DataFrame:
        return self.spark.read.parquet(self.samples_path)

    # -- delete ------------------------------------------------------------

    def delete(
        self,
        metrics: list | None = None,
        filter: str | None = None,
        from_time=None,
        to_time=None,
        delete_all: bool = False,
    ) -> None:
        """Delete by time range / metric / filter, then recompute the
        rollup for affected dates.

        ref: pkg/tsdb/v3iotsdb.go:273-477 (DeleteDB) — the partial-chunk
        surgical rewrite becomes: rewrite only the affected dt
        partitions (dynamic partition overwrite), then rebuild rollup
        partials for those dates (analog of the aggregate-bucket
        recompute, v3iotsdb.go:722-783).
        """
        if delete_all:
            self.delete_db()
            return
        from_ms = str2unix_ms(from_time) if from_time is not None else None
        to_ms = str2unix_ms(to_time) if to_time is not None else None

        cond = F.lit(True)
        if metrics:
            cond = cond & F.col("name").isin(list(metrics))
        if filter:
            cond = cond & F.expr(translate_filter(filter))
        if from_ms is not None:
            cond = cond & (F.col("ts") >= F.lit(from_ms))
        if to_ms is not None:
            cond = cond & (F.col("ts") <= F.lit(to_ms))
        # SQL three-valued logic: a label filter over rows lacking that
        # label is NULL, and ~NULL is NULL — which would drop rows that
        # did NOT match the delete condition. Pin NULL to "not deleted".
        cond = F.coalesce(cond, F.lit(False))

        df = self._samples()
        doomed = df.where(cond)
        affected_dts = [r["dt"] for r in doomed.select("dt").distinct().collect()]
        if not affected_dts:
            return
        # rdt partitions the doomed rows' buckets land in (bucket-date can
        # differ from sample-date when granularity doesn't divide a day)
        gran = self.config.granularity_ms
        doomed_rdts = [
            r["rdt"]
            for r in doomed.select(
                F.date_format(
                    F.timestamp_millis(F.col("ts") - F.col("ts") % F.lit(gran)), "yyyy-MM-dd"
                ).alias("rdt")
            ).distinct().collect()
        ]
        prev_mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            kept = df.where(F.col("dt").isin(affected_dts)).where(~cond)
            kept_dts = {r["dt"] for r in kept.select("dt").distinct().collect()}
            kept.write.mode("overwrite").partitionBy("dt").parquet(self.samples_path)
            # dynamic overwrite only rewrites partitions present in the
            # written frame — fully-emptied dt partitions must go explicitly
            for dt in set(affected_dts) - kept_dts:
                shutil.rmtree(os.path.join(self.samples_path, f"dt={dt}"), ignore_errors=True)
            if os.path.exists(self.rollup_path):
                self._rebuild_rollup_for_dates(affected_dts, doomed_rdts)
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    def _rebuild_rollup_for_dates(self, dts: list, doomed_rdts: list | None = None) -> None:
        fresh = self._samples().where(F.col("dt").isin(dts)).drop("dt")
        partial = ru.build_rollup(fresh, self.config.granularity_ms)
        partial = partial.withColumn(
            "rdt", F.date_format(F.timestamp_millis(F.col("bucket")), "yyyy-MM-dd")
        )
        # rollup buckets are wall-aligned so bucket-date == sample-date
        # only when granularity divides a day; rebuild the covering dates
        new_rdts = {r["rdt"] for r in partial.select("rdt").distinct().collect()}
        partial.write.mode("overwrite").partitionBy("rdt").parquet(self.rollup_path)
        stale = set(doomed_rdts or []) - new_rdts
        for rdt in stale:
            shutil.rmtree(os.path.join(self.rollup_path, f"rdt={rdt}"), ignore_errors=True)
        for subset in self.config.pre_aggregates:
            path = self._label_rollup_path(subset)
            if not os.path.exists(path):
                continue
            p = ru.build_label_rollup(fresh, self.config.granularity_ms, tuple(subset))
            p = p.withColumn(
                "rdt", F.date_format(F.timestamp_millis(F.col("bucket")), "yyyy-MM-dd")
            )
            p.write.mode("overwrite").partitionBy("rdt").parquet(path)
            for rdt in stale:
                shutil.rmtree(os.path.join(path, f"rdt={rdt}"), ignore_errors=True)
