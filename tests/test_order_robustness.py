"""Order-robustness tests (VERDICT r11 #1/#2).

The r11 driver red was a 6dp-rounded mean-of-logs whose float sum
accumulated in partition order (`events_session_perplexity`). The fix
quantizes every log term to integer micro-nats before summation
(`functions/text.py::micro_nats`), which makes the verdict columns
partitioning-invariant by construction. These tests pin that: each
converted operator must produce IDENTICAL (bit-equal after the
operator's own rounding) results when the input is `repartition(1)`
versus `repartition(64)` — i.e. under a single sequential accumulation
order versus 64-way partial aggregation.

The full-registry sweep lives in tools/check_order_robustness.py
(wired into tools/gate.py); these are the fast in-suite sentinels.
"""

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _frames_equal(a, b):
    """Exact equality after the check_oracle normalization (sorted
    columns/rows, floats rounded 6dp) — the driver's hash contract."""
    import pandas as pd  # noqa: F401

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif str(df[c].dtype).startswith("float"):
                df[c] = df[c].round(6)
        return df.sort_values(
            by=list(df.columns), na_position="first"
        ).reset_index(drop=True)

    na, nb = norm(a), norm(b)
    assert list(na.columns) == list(nb.columns)
    assert len(na) == len(nb)
    assert na.equals(nb)


def _run_both(df_fn, op):
    out1 = op(df_fn(1)).toPandas()
    out64 = op(df_fn(64)).toPandas()
    _frames_equal(out1, out64)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_session_perplexity_repartition_invariant(spark, events):
    """X162, the r11 driver red: the session mean-of-logs must be
    identical at repartition(1) and repartition(64)."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.operators.paths import session_perplexity

    base = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
    )
    _run_both(lambda n: base.repartition(n), session_perplexity)


def test_unigram_logprob_repartition_invariant(spark, docs):
    from v3io_tsdb_spark.functions.text import unigram_logprob

    _run_both(lambda n: docs.repartition(n), unigram_logprob)


def test_kn_bigram_repartition_invariant(spark, docs):
    from v3io_tsdb_spark.functions.text import kn_bigram_logprob

    _run_both(lambda n: docs.repartition(n), kn_bigram_logprob)


def test_zipf_fit_repartition_invariant(spark, docs):
    from v3io_tsdb_spark.functions.text import zipf_fit

    _run_both(lambda n: docs.repartition(n), zipf_fit)


def test_vocab_growth_repartition_invariant(spark, docs):
    from v3io_tsdb_spark.functions.text import vocab_growth

    _run_both(lambda n: docs.repartition(n), vocab_growth)


# ------------------------------------ quantization form properties


def _py_half_away(c):
    import math

    return (math.floor(c + 0.5) if c >= 0 else -math.floor(-c + 0.5))


def test_qhalf_matches_python_half_away(spark):
    """The floor/ceil quantization form (similarity._qhalf /
    text.micro_nats) selects the half-away-from-zero integer on a
    gauntlet of boundary cases: exact dyadic halves (float32-sourced
    values × 2^15 land on these), negatives, zero, and large
    magnitudes."""
    from pyspark.sql import functions as F

    from v3io_tsdb_spark.functions.similarity import _qhalf

    cases = [
        0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,          # exact halves
        0.49999999999, -0.49999999999, 1.0000000001,
        12345.5, -12345.5, 3.2767e4, -3.2768e4,
        7.25, -7.25, 1e-12, -1e-12, 999999.5, -999999.5,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "c double")
    got = [r["q"] for r in
           df.select(_qhalf(F.col("c")).alias("q")).collect()]
    assert got == [_py_half_away(c) for c in cases]


def test_micro_nats_matches_python(spark):
    """micro_nats = half-away-from-zero(ln·1e6) as a long, identical
    to the python mirror over log-scale values."""
    import math

    from pyspark.sql import functions as F

    from v3io_tsdb_spark.functions.text import micro_nats

    vals = [1.0, 0.5, 0.1, 0.001, 1e-6, 0.999999, 0.123456]
    df = spark.createDataFrame([(v,) for v in vals], "p double")
    got = [r["m"] for r in
           df.select(micro_nats(F.log("p")).alias("m")).collect()]
    assert got == [_py_half_away(math.log(v) * 1e6) for v in vals]
