import pytest
from pyspark.sql import SparkSession

# Reference fixture anchor, ref: pqueriertest/integration_test_basic_test.go:56
T0 = 1532209200000  # 2018-07-21T21:40:00Z
MIN = 60_000


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("v3io-tsdb-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def make_samples(spark):
    """Build a normalized samples DataFrame from (name, labels, [(off_ms, v), ...])."""
    from v3io_tsdb_spark.appender import normalize_samples

    def _make(series, t0=T0):
        rows = []
        for name, labels, points in series:
            for off, v in points:
                row = {"ts": t0 + off, "name": name, "labels": labels}
                if isinstance(v, str):
                    row["value_str"] = v
                else:
                    row["value"] = float(v)
                rows.append(row)
        return normalize_samples(spark, rows)

    return _make


def rows_to_dict(df, key_cols, val_cols):
    out = {}
    for r in df.collect():
        k = tuple(r[c] for c in key_cols) if len(key_cols) > 1 else r[key_cols[0]]
        out[k] = tuple(r[c] for c in val_cols) if len(val_cols) > 1 else r[val_cols[0]]
    return out
