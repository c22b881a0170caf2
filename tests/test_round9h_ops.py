"""Round-9 eighth wave: iterative Lloyd k-means, alert episodes,
multiwindow SLO burn rate — goldens plus plan audits."""

import math

from pyspark.sql import functions as F

HOUR = 3_600_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- k-means


def test_kmeans_recovers_clusters_from_bad_seeds(spark):
    """Both seeds land in cluster A ([0,0] and [0.1,0]) yet two Lloyd
    rounds pull centroid 1 across to the far cluster: final profile is
    2+2 — the convergence behavior one assignment step (X88) cannot
    show."""
    from v3io_tsdb_spark.functions.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 10.0]),
         (3, [10.1, 10.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["centroid_id"]: r for r in kmeans_lloyd(df, k=2, n_iter=3).collect()}
    assert {r["n_vecs"] for r in out.values()} == {2}
    # converged centroids [0.05, 0] and [10.05, 10]: inertia 2·0.05²
    assert math.isclose(out[0]["inertia"], 0.005, abs_tol=1e-6)
    assert math.isclose(out[1]["inertia"], 0.005, abs_tol=1e-6)


def test_kmeans_empty_cluster_dies(spark):
    """Identical vectors give identical seed centroids: every vector
    ties to the LOWEST cid, the other centroid loses all members and
    drops out — one final row, not a null-filled ghost."""
    from v3io_tsdb_spark.functions.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_lloyd(df, k=2, n_iter=3).collect()
    assert len(out) == 1
    assert out[0]["centroid_id"] == 0 and out[0]["n_vecs"] == 4
    assert out[0]["inertia"] == 0.0


def test_kmeans_final_plan_never_shuffles_vectors(spark):
    """Single-plan Lloyd (r12): centroids ride as a one-row BROADCAST
    panel (BroadcastNestedLoopJoin, build right), seeds come from
    TakeOrderedAndProject (never a global sort of the data), and every
    hash-partitioned exchange carries only panel columns (_cid/_pos
    partial aggregates) — the vector column never crosses a shuffle."""
    from v3io_tsdb_spark.functions.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_lloyd(df, k=2, n_iter=2, materialize=False)
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, plan[:900]
    assert "ShuffledHashJoin" not in plan, plan[:900]
    assert "BroadcastNestedLoopJoin" in plan, plan[:900]
    assert "TakeOrderedAndProject" in plan, plan[:900]
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_v#" not in line, line


# ------------------------------------------------- alert episodes


def test_alert_episodes_golden_islands(spark):
    """Flagged hours {0,1,2, 5, 7,8} merge into exactly three
    episodes: [0–2] (3 buckets), [5] (1), [7–8] (2); peak is the worst
    bucket of each episode; unflagged buckets never appear."""
    from v3io_tsdb_spark.operators.anomaly import alert_episodes

    rows = [("m", h * HOUR, 1 if h in (0, 1, 2, 5, 7, 8) else 0,
             float(10 + h)) for h in range(10)]
    df = spark.createDataFrame(rows, "name string, t long, flag int, v double")
    out = sorted(
        alert_episodes(df, ("name",), "t", "flag", "v", HOUR).collect(),
        key=lambda r: r["start_t"],
    )
    got = [(r["start_t"] // HOUR, r["end_t"] // HOUR, r["n_buckets"], r["peak"])
           for r in out]
    assert got == [(0, 2, 3, 12.0), (5, 5, 1, 15.0), (7, 8, 2, 18.0)]


def test_alert_episodes_hole_closes_episode(spark):
    """A missing GRID bucket (not merely unflagged) also severs an
    episode: flags at hours 0 and 2 with hour 1 absent entirely → two
    episodes. Adjacency means exactly step_ms apart."""
    from v3io_tsdb_spark.operators.anomaly import alert_episodes

    df = spark.createDataFrame(
        [("m", 0, 1, 1.0), ("m", 2 * HOUR, 1, 2.0)],
        "name string, t long, flag int, v double",
    )
    assert alert_episodes(df, ("name",), "t", "flag", "v", HOUR).count() == 2


def test_alert_episodes_single_exchange(spark):
    from v3io_tsdb_spark.operators.anomaly import alert_episodes

    df = spark.createDataFrame(
        [("m", 0, 1, 1.0)], "name string, t long, flag int, v double"
    )
    plan = _plan(alert_episodes(df, ("name",), "t", "flag", "v", HOUR))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") == 1, plan[:1200]


# ------------------------------------------------- SLO burn rate


def test_slo_burn_long_window_delays_paging(spark):
    """Hours 0–3 clean, hours 4–9 at 100% errors, SLO 90%, threshold
    6: the short window screams from hour 4 (burn 10) but the 6-hour
    window crosses 6 only at hour 7 (40/60 → 6.67) — the page fires at
    hours 7–9, not at the first spike. That delay IS the two-window
    design."""
    from v3io_tsdb_spark.operators.counters import slo_burn_rate

    rows = []
    eid = 0
    for h in range(10):
        for i in range(10):
            name = "error" if h >= 4 else "ok"
            rows.append((name, "u", h * HOUR + i, 1.0))
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {r["t"] // HOUR: r for r in slo_burn_rate(
        df, error_name="error", ts_col="t", step_ms=HOUR, from_ms=0,
        short_buckets=1, long_buckets=6, slo_target=0.9, burn_threshold=6.0,
    ).collect()}
    assert [h for h in range(10) if out[h]["page"] == 1] == [7, 8, 9]
    assert math.isclose(out[4]["burn_short"], 10.0)
    assert math.isclose(out[7]["burn_long"], (40 / 60) / 0.1, rel_tol=1e-9)


def test_slo_burn_no_join_single_reduce(spark):
    """One conditional-aggregation shuffle builds the (errors, total)
    grid; both trailing windows run on that panel — no join, no second
    data-sized exchange."""
    from v3io_tsdb_spark.operators.counters import slo_burn_rate

    df = spark.createDataFrame(
        [("error", "u", 0, 1.0), ("ok", "u", 1, 1.0)],
        "name string, uid string, t long, value double",
    )
    plan = _plan(slo_burn_rate(df, ts_col="t", step_ms=HOUR))
    assert "Join" not in plan, plan[:800]


# ----------------------------------- seasonally-adjusted anomaly


def test_adjusted_anomaly_monday_rush_never_flags(spark):
    """A series with a big weekly template (+20 every phase-0 'Monday')
    and tiny alternating noise: raw values would z-flag every Monday
    (|raw z| > 2, shown numerically), but the RESIDUAL screen flags
    nothing — the decomposition absorbed the rush. That distinction is
    the operator's whole reason to exist next to bucket_zscores."""
    import statistics

    from v3io_tsdb_spark.operators.anomaly import seasonal_adjusted_flags

    DAY = 86_400_000
    s_pat = [20.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vals = [100.0 + s_pat[i % 7] + (0.1 if i % 2 else -0.1)
            for i in range(21)]
    rows = [("m", "u", i * DAY, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = seasonal_adjusted_flags(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, period=7, k=2.0,
    ).collect()
    assert len(out) > 0
    assert all(r["flag"] == 0 for r in out), [
        (r["t"] // DAY, r["z"]) for r in out if r["flag"]
    ]
    # the contrast: a flat z-screen on RAW values pages every Monday
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert abs((vals[7] - mu) / sd) > 2


def test_adjusted_anomaly_spike_flags_through_the_template(spark):
    """Same weekly template, but one mid-week day carries a +60 spike:
    the spike day is the UNIQUE flagged bucket — seasonal adjustment
    removes the template, not genuine anomalies."""
    from v3io_tsdb_spark.operators.anomaly import seasonal_adjusted_flags

    DAY = 86_400_000
    s_pat = [20.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vals = [100.0 + s_pat[i % 7] + (0.1 if i % 2 else -0.1)
            for i in range(21)]
    vals[10] += 60.0
    rows = [("m", "u", i * DAY, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = seasonal_adjusted_flags(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, period=7, k=2.0,
    ).collect()
    flagged = sorted(r["t"] // DAY for r in out if r["flag"] == 1)
    assert 10 in flagged
    assert flagged == [10] or set(flagged) <= {10}, flagged
