"""Retirement pins for the four rows rotated out of the driver
registry in r16 (VERDICT r15 #2: 45 r12-stale rows + 1 net-new + the
6-row perplexity control matrix + 2 diag probe rows demanded 53 of 50
head slots — four more near-duplicates shed).

Same contract as test_round14_retired.py / test_round15_retired.py: a
retirement moves a row's DRIVER SLOT, never its correctness coverage —
every retired builder still runs against its DuckDB oracle on real
testdata here, under the local gate's normalization (including the r16
dtype-kind audit: an int-vs-float dtype split between the Spark and
oracle frames is the driver typed-hash red class and fails here too).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

RETIRED_R16_SIBLINGS = {
    "tsdb_variant_mixed_frame": "tsdb_variant_raw",
    "doc_winnow_matches": "doc_winnow_fingerprints",
    "stream_conversion_latency": "events_conversion_latency",
    "events_hll_daily": "events_hll_weekly_rollup",
    # proactive r17-slack pair (the r13 evidence cohort is 49 rows —
    # the next head with zero slack; stream-twin precedent r13/r15)
    "stream_wav_features": "mm_wav_features",
    "stream_anomaly_hourly": "events_anomaly_hourly",
}


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    # the local-gate normalization (tools/check_oracle.py::norm)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(
        by=list(df.columns), na_position="first"
    ).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    import __spark_entry__ as E  # noqa: F401  (path bootstrap)
    from v3io_tsdb_spark.datasets import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(RETIRED_R16_SIBLINGS))
def test_retired_row_matches_oracle(spark, oracle_con, name):
    import __spark_entry__ as E

    fn = E.retired_queries()[name]
    sql = E.retired_oracle_sql()[name]
    s = _norm(fn(spark, SF).toPandas())
    o = _norm(oracle_con.sql(sql).df())
    assert list(s.columns) == list(o.columns), name
    assert len(s) == len(o), (name, len(s), len(o))
    for c in s.columns:
        a, b = s[c], o[c]
        ka, kb = a.dtype.kind, b.dtype.kind
        # the r16 driver typed-hash red class (VERDICT r15 #1): an
        # int column on one side vs float on the other is a failure
        # even when every value is numerically equal
        assert not (ka != kb and {ka, kb} <= {"i", "u", "f"}
                    and "f" in (ka, kb)), (name, c, str(a.dtype), str(b.dtype))
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            bad = ~((a.isna() & b.isna()) | (a == b)
                    | ((a - b).abs() <= 1e-9))
        else:
            bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        assert not bad.any(), (name, c, int(bad.sum()))


def test_retirement_bookkeeping_r16():
    """RETIRED_R16 rows left the live registry, kept their oracles, and
    each family keeps a LIVE sibling gated (names pinned so a later
    rename breaks loudly)."""
    import __spark_entry__ as E

    live = set(E.queries())
    retired = set(E.retired_queries())
    assert set(E.RETIRED_R16) == set(RETIRED_R16_SIBLINGS)
    for r, s in RETIRED_R16_SIBLINGS.items():
        assert r in retired and r not in live, r
        assert s in live, (r, s)
