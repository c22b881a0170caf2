"""Retirement pins for the six rows rotated out of the driver registry
in r14 (registry <=200 discipline, VERDICT r13 #8 / queries()
docstring).

A retirement moves a row's DRIVER SLOT, never its correctness
coverage: this sweep runs every `__spark_entry__.retired_queries()`
builder against its `retired_oracle_sql()` DuckDB twin on real
testdata, under the same normalization the local gate uses — so the
retired rows keep Spark-vs-oracle equivalence pinned in pytest
forever, and a regression in a shared code path (pq index, logprob
profile bins, Holt-Winters recursion, centroid assignment, weighted
sampling, seasonal-naive MASE) still fails CI even though the driver
no longer gates the row.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


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


def _retired_names():
    import __spark_entry__ as E

    return sorted(E.retired_queries())


@pytest.mark.parametrize("name", [
    "emb_pq_recall",
    "doc_logprob_profile",
    "tsdb_hw_daily",
    "emb_centroid_profile",
    "doc_weighted_sample",
    "tsdb_seasonal_naive",
])
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


def test_retirement_bookkeeping():
    """The retired set and the live registry stay disjoint and their
    union covers the full oracle map; every retired row keeps a
    sibling gating its family (names pinned here so a later rename
    breaks loudly)."""
    import __spark_entry__ as E

    live = set(E.queries())
    retired = set(E.retired_queries())
    assert live.isdisjoint(retired)
    assert set(E.oracle_sql()).isdisjoint(retired)
    # r15/r16 added RETIRED_R15/RETIRED_R16 alongside — the full
    # retired set is the union (test_round15_retired.py /
    # test_round16_retired.py pin the per-round slices)
    assert retired == (set(E.RETIRED_R14) | set(E.RETIRED_R15)
                       | set(E.RETIRED_R16))
    assert retired == set(E.retired_oracle_sql())
    assert set(E.RETIRED_R14) <= retired
    siblings = {
        "emb_pq_recall": "emb_pq_topk",
        "doc_logprob_profile": "doc_unigram_logprob",
        "tsdb_hw_daily": "tsdb_hw_anomaly",
        "emb_centroid_profile": "emb_kmeans_profile",
        "doc_weighted_sample": "events_sampled_hourly",
        "tsdb_seasonal_naive": "tsdb_seasonal_decompose",
    }
    for r, s in siblings.items():
        assert r in retired and s in live, (r, s)
