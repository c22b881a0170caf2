"""Round-10 wave 5 goldens: PCA power iteration, session perplexity,
Q17/Q18 join shapes."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ PCA power it


def test_pca_recovers_dominant_axis(spark):
    """A corpus stretched along a known axis (strong variance on dim
    1, noise on dim 0): the top component concentrates on dim 1 and
    the eigenvalue approximates the dominant variance."""
    from v3io_tsdb_spark.functions.similarity import pca_top_component

    rows = [(i, [0.1 * ((i * 7) % 3 - 1), float(i % 11 - 5)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim_idx"]: r for r in
           pca_top_component(df, dim=2, n_iter=8).collect()}
    assert abs(out[1]["component"]) > 0.99
    assert abs(out[0]["component"]) < 0.12
    # variance of (i % 11 - 5) over uniform residues = 10
    assert out[0]["eigenvalue"] == out[1]["eigenvalue"]
    assert out[0]["eigenvalue"] == pytest.approx(10.0, rel=0.05)


def test_pca_unit_norm_output(spark):
    from v3io_tsdb_spark.functions.similarity import pca_top_component

    rows = [(i, [float(i % 5), float((i * 3) % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps = [r["component"] for r in
             pca_top_component(df, dim=3, n_iter=6).collect()]
    assert sum(c * c for c in comps) == pytest.approx(1.0, abs=1e-4)


def test_pca_constant_dim_contributes_nothing(spark):
    """A constant dimension has zero variance: its component must be
    ~0 (covariance row is all zeros after centering)."""
    from v3io_tsdb_spark.functions.similarity import pca_top_component

    rows = [(i, [5.0, float(i)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim_idx"]: r["component"] for r in
           pca_top_component(df, dim=2, n_iter=5).collect()}
    assert out[0] == 0.0 and abs(out[1]) == 1.0


# ------------------------------------------------- session perplexity


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long"
    )


def test_session_perplexity_flags_improbable_walk(spark):
    """Corpus dominated by A>B transitions plus one A>C walk: the
    session using the rare edge scores strictly lower."""
    from v3io_tsdb_spark.operators.paths import session_perplexity

    rows = []
    eid = 0
    for u in range(5):  # five users walk A>B
        rows += [(u, 1000, "A", eid), (u, 2000, "B", eid + 1)]
        eid += 2
    rows += [(9, 1000, "A", eid), (9, 2000, "C", eid + 1)]  # rare edge
    out = {r["user_id"]: r for r in
           session_perplexity(_mk_events(spark, rows)).collect()}
    common = out[0]["mean_logp"]
    rare = out[9]["mean_logp"]
    assert rare < common
    assert common == pytest.approx(math.log(5 / 6), abs=1e-5)
    assert rare == pytest.approx(math.log(1 / 6), abs=1e-5)


def test_session_perplexity_single_event_sessions_drop(spark):
    from v3io_tsdb_spark.operators.paths import session_perplexity

    rows = [(1, 1000, "A", 1), (2, 1000, "A", 2), (2, 2000, "B", 3)]
    out = session_perplexity(_mk_events(spark, rows)).collect()
    assert [r["user_id"] for r in out] == [2]


# ----------------------------------------------------- Q17/Q18 shapes


def test_q17_small_quantity_filter(spark):
    """Part 1 averages qty 10: only the qty-4 line is below half."""
    li = spark.createDataFrame(
        [(1, 4.0, 100.0), (1, 16.0, 200.0), (2, 5.0, 50.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.avg("l_quantity").alias("_aq"))
    out = (
        li.join(avg_q, F.col("l_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("_aq"))
        .agg(F.sum("l_extendedprice").alias("rev"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert out["n"] == 1 and out["rev"] == 100.0


def test_q18_having_filters_before_joins(spark):
    """The HAVING threshold runs on the fact aggregate BEFORE the
    dimension joins — the join input is the survivor set."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    df = E.queries()["tpch_q18_big_orders"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the quantity aggregate + filter must appear BELOW the joins
    # (optimized plan: Filter over Aggregate under the Join, not above)
    ijoin = plan.index("Join")
    assert "sum_qty" in plan[ijoin:], "aggregate feeds the join side"
    rows = df.limit(5).collect()
    for r in rows:
        assert r["sum_qty"] > 150
