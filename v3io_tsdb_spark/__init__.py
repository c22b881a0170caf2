"""v3io_tsdb_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
v3io/v3io-tsdb (the reference, a Go TSDB over a KV store), re-expressed
Spark-first: samples live in a long-format partitioned Parquet table,
rollups are materialized aggregate tables, and every query is one lazy
DataFrame plan optimized by Catalyst.

Reference behavior citations use ``ref: <path>:<lines>`` pointing into
the v3io/v3io-tsdb source tree.
"""

from v3io_tsdb_spark.adapter import TSDBAdapter
from v3io_tsdb_spark.config import TSDBConfig
from v3io_tsdb_spark.prom import PromSeries, select_series
from v3io_tsdb_spark.querier import Querier, RequestedColumn, SelectParams
from v3io_tsdb_spark.timeutils import str2duration_ms, str2unix_ms

__version__ = "0.1.0"

__all__ = [
    "TSDBAdapter",
    "TSDBConfig",
    "Querier",
    "SelectParams",
    "RequestedColumn",
    "PromSeries",
    "select_series",
    "str2duration_ms",
    "str2unix_ms",
]
