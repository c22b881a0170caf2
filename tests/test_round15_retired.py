"""Retirement pins for the eight rows rotated out of the driver
registry in r15 (VERDICT r14 #2: the rotation needed >=6 more slots
shed — 46 stale + 8 never-green + 2 new rows competing for 50).

Same contract as test_round14_retired.py: a retirement moves a row's
DRIVER SLOT, never its correctness coverage — every retired builder
still runs against its DuckDB oracle on real testdata here, under the
local gate's normalization, so a regression in the shared module path
(counters extrapolation, trend windows, Holt-Winters recursion, cohort
rolling actives, prev-interp downsample, per-group top-N) still fails
CI even though the driver no longer gates the row.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

RETIRED_R15_SIBLINGS = {
    "emb_lsh_recall": "emb_lsh_topk",
    "emb_ivf_recall": "emb_ivf_topk",
    "tsdb_increase_daily": "tsdb_irate_daily",
    "tsdb_bollinger_daily": "tsdb_ewma_daily",
    "tsdb_wow_daily": "tsdb_ewma_daily",
    "tsdb_hw_forecast": "tsdb_hw_anomaly",
    "tsdb_drawdown_daily": "tsdb_ewma_daily",
    "events_dau_wau": "events_retention_cohorts",
    "tsdb_downsample_prev_6h": "tsdb_downsample_6h",
    "events_top_users_daily": "events_stratified_hourly",
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


@pytest.mark.parametrize("name", sorted(RETIRED_R15_SIBLINGS))
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
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            bad = ~((a.isna() & b.isna()) | (a == b)
                    | ((a - b).abs() <= 1e-9))
        else:
            bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        assert not bad.any(), (name, c, int(bad.sum()))


def test_retirement_bookkeeping_r15():
    """RETIRED_R15 rows left the live registry, kept their oracles, and
    each family keeps a LIVE sibling gated (names pinned so a later
    rename breaks loudly)."""
    import __spark_entry__ as E

    live = set(E.queries())
    retired = set(E.retired_queries())
    assert set(E.RETIRED_R15) == set(RETIRED_R15_SIBLINGS)
    for r, s in RETIRED_R15_SIBLINGS.items():
        assert r in retired and r not in live, r
        assert s in live, (r, s)
