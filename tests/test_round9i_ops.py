"""Round-9 ninth wave: PromQL offset (week-over-week), table profile,
Kaplan-Meier survival, MMR diversified retrieval — goldens plus plan
audits."""

import math

from pyspark.sql import functions as F

DAY = 86_400_000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- offset / WoW


def test_offset_compare_golden_and_gap_safety(spark):
    """Days 0..13 with day 3 MISSING: day 10's prior bucket (day 3)
    is absent, so prev/delta/pct are null — a ROWS-frame lag(7) would
    silently serve day 2 there. Day 9 compares against day 2
    normally."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    rows = [
        ("m", "u", d * DAY, float(100 + d))
        for d in range(14)
        if d != 3
    ]
    df = spark.createDataFrame(rows, "name string, uid string, t long, value double")
    out = {
        r["t"] // DAY: r
        for r in offset_compare(
            df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
            from_ms=0, offset_buckets=7,
        ).collect()
    }
    assert len(out) == 13
    # day 9 ← day 2: 109 vs 102
    assert math.isclose(out[9]["prev"], 102.0)
    assert math.isclose(out[9]["delta"], 7.0)
    assert math.isclose(out[9]["pct"], 7.0 / 102.0)
    # day 10 ← missing day 3: no verdict
    assert out[10]["prev"] is None
    assert out[10]["delta"] is None
    assert out[10]["pct"] is None
    # warm-up rows (t < 7d) have no prior bucket either
    assert out[0]["prev"] is None


def test_offset_compare_zero_prev_null_pct(spark):
    """A prior value of exactly 0 defines delta but not pct (no
    ratio), matching the try_divide convention everywhere else."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("m", "u", 0, 0.0), ("m", "u", 7 * DAY, 5.0)],
        "name string, uid string, t long, value double",
    )
    out = {r["t"] // DAY: r for r in offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=7,
    ).collect()}
    assert math.isclose(out[7]["prev"], 0.0)
    assert math.isclose(out[7]["delta"], 5.0)
    assert out[7]["pct"] is None


def test_offset_compare_no_join_partial_agg_first(spark):
    """The prior value comes from a window, never a self-join, and
    the only data-sized exchange is the grid reduce, which carries
    map-side partial aggregates; the second exchange moves the
    already-reduced panel to the series-keyed window."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("m", "u", 0, 1.0)], "name string, uid string, t long, value double"
    )
    plan = _plan(offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=7,
    ))
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1200]
    # map-side combine before the data-sized exchange
    assert plan.count("HashAggregate") == 2, plan[:1200]


# ------------------------------------------------------- table profile


def test_table_profile_golden_counts(spark):
    """Nulls, exact distincts, and type-split min/max/mean on a
    crafted frame: numeric columns carry min_num/max_num/mean, string
    columns carry min_str/max_str, each null on the other side."""
    from v3io_tsdb_spark.functions.profile import table_profile

    df = spark.createDataFrame(
        [(1, "b", 10.0), (2, "a", None), (2, None, 30.0)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in table_profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert out["id"]["n_rows"] == 3 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 2
    assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 2.0
    assert math.isclose(out["id"]["mean"], 5.0 / 3.0)
    assert out["id"]["min_str"] is None
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None and out["s"]["mean"] is None
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_num"] == 10.0 and out["v"]["max_num"] == 30.0


def test_table_profile_approx_mode_no_expand(spark):
    """approx=True swaps exact count(DISTINCT) for HLL: the plan must
    carry NO Expand node (the O(n_cols)x row replication the exact
    path pays), while the exact plan does."""
    from v3io_tsdb_spark.functions.profile import table_profile

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    exact_plan = _plan(table_profile(df, approx=False))
    approx_plan = _plan(table_profile(df, approx=True))
    assert "Expand" in exact_plan, exact_plan[:1200]
    assert "Expand" not in approx_plan, approx_plan[:1200]
    # approx counts are still sane on tiny exact-regime inputs
    out = {r["column"]: r["n_distinct"]
           for r in table_profile(df, approx=True).collect()}
    assert out == {"id": 1, "s": 1}


def test_table_profile_column_subset_and_unknown(spark):
    from v3io_tsdb_spark.functions.profile import table_profile
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert [r["column"] for r in table_profile(df, columns=["s"]).collect()] == ["s"]
    with pytest.raises(ValueError):
        table_profile(df, columns=["nope"])


# ------------------------------------------------------- Kaplan-Meier


def test_km_textbook_curve_with_censoring(spark):
    """Hand-computed: subjects (1,event),(2,censored),(3,event),
    (3,event),(4,censored). S(1)=4/5; the censored-at-2 subject
    leaves the risk set WITHOUT a curve step, so at d=3 the risk set
    is 3 and S(3)=0.8*(1/3) — the correction naive averaging lacks."""
    from v3io_tsdb_spark.operators.cohorts import _km_curve

    per_user = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)], "duration long, _ev long"
    )
    out = {r["duration"]: r for r in _km_curve(per_user).collect()}
    assert set(out) == {1, 3}  # censor times never emit curve rows
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert math.isclose(out[1]["survival"], 0.8)
    assert out[3]["n_risk"] == 3 and out[3]["n_events"] == 2
    assert math.isclose(out[3]["survival"], 0.8 / 3.0)


def test_km_exhausted_risk_set_pins_zero(spark):
    """When everyone remaining dies, the factor hits 0 and survival
    is 0 — computed via the absorbing flag, not exp(ln(0))."""
    from v3io_tsdb_spark.operators.cohorts import _km_curve

    per_user = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1)], "duration long, _ev long"
    )
    out = {r["duration"]: r for r in _km_curve(per_user).collect()}
    assert math.isclose(out[1]["survival"], 2.0 / 3.0)
    assert out[2]["survival"] == 0.0


def test_km_churn_form_gap_rule(spark):
    """horizon=day 30, gap=7d: a user last seen day 10 is an observed
    churn (lifetime 10-0=10); one last seen day 28 is censored."""
    from v3io_tsdb_spark.operators.cohorts import kaplan_meier

    rows = [(1, 0), (1, 10 * DAY), (2, 0), (2, 28 * DAY), (3, 2 * DAY),
            (3, 12 * DAY)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r["duration"]: r for r in kaplan_meier(
        df, horizon_ms=30 * DAY, churn_gap_ms=7 * DAY, step_ms=DAY,
    ).collect()}
    assert set(out) == {10}  # both churners had 10-day lifetimes
    # user 2 (28-day lifetime, censored) is still AT RISK at d=10
    assert out[10]["n_events"] == 2 and out[10]["n_risk"] == 3
    assert math.isclose(out[10]["survival"], 1.0 / 3.0)


def test_km_conversion_form_horizon_censoring(spark):
    """Users: A converts at +1d (observed), B converts at +9d — past
    the 7d horizon, so CENSORED at horizon−first=7d, not observed at
    9d; C never converts (censored); D's first event is after the
    horizon and never enters the study."""
    from v3io_tsdb_spark.operators.cohorts import kaplan_meier_conversion

    rows = [
        (1, 0, "view"), (1, 1 * DAY, "purchase"),
        (2, 0, "view"), (2, 9 * DAY, "purchase"),
        (3, 0, "view"), (3, 2 * DAY, "view"),
        (4, 8 * DAY, "view"), (4, 9 * DAY, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")
    out = {r["duration"]: r for r in kaplan_meier_conversion(
        df, horizon_ms=7 * DAY, step_ms=DAY,
    ).collect()}
    assert set(out) == {1}
    assert out[1]["n_risk"] == 3          # A, B, C — never D
    assert out[1]["n_events"] == 1
    assert out[1]["n_censored"] == 0      # B and C censored at 7d, not 1d
    assert math.isclose(out[1]["survival"], 2.0 / 3.0)


def test_km_no_join_user_reduce_first(spark):
    """The only data-sized exchange is the per-user reduce, carrying
    map-side partials; the curve windows ride the bounded panel."""
    from v3io_tsdb_spark.operators.cohorts import kaplan_meier_conversion

    df = spark.createDataFrame(
        [(1, 0, "view")], "user_id long, ts_ms long, event_type string"
    )
    plan = _plan(kaplan_meier_conversion(df, horizon_ms=7 * DAY))
    assert "Join" not in plan, plan[:800]


# ------------------------------------------------------- MMR top-k


def test_mmr_prefers_diverse_over_redundant(spark):
    """The defining contrast: two near-clones of the best hit vs one
    moderately-relevant but DIFFERENT vector. Pure cosine ranks the
    clones 1-2; MMR (lam=0.5) takes the different vector second
    because the clone's marginal relevance collapses."""
    from v3io_tsdb_spark.functions.similarity import cosine_topk, mmr_topk

    rows = [
        (1, [0.99, 0.14]),    # a1 ~ query
        (2, [0.99, 0.141]),   # a2: clone of a1
        (3, [0.99, 0.142]),   # a3: clone of a1
        (4, [0.8, -0.6]),     # b: diverse, still relevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0]
    cos_order = [r["vec_id"] for r in cosine_topk(df, q, k=2).collect()]
    assert cos_order == [1, 2]
    mmr = mmr_topk(df, q, k=2, lam=0.5, prefilter_m=4).collect()
    assert [r["vec_id"] for r in sorted(mmr, key=lambda r: r["rank"])] == [1, 4]
    # the diverse pick's penalty used its true max-sim to the selected set
    assert mmr[1]["max_sim"] < mmr[1]["relevance"] + 1e-9


def test_mmr_lambda_one_is_pure_relevance(spark):
    """lam=1 zeroes the diversity term: order must equal cosine_topk
    (including id tie-breaks)."""
    from v3io_tsdb_spark.functions.similarity import cosine_topk, mmr_topk

    rows = [(i, [1.0, 0.1 * i, 0.01 * i * i]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [0.3, 0.9, 0.2]
    want = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    got = [r["vec_id"] for r in
           sorted(mmr_topk(df, q, k=5, lam=1.0, prefilter_m=8).collect(),
                  key=lambda r: r["rank"])]
    assert got == want


def test_mmr_zero_norm_excluded_and_prefilter_pool(spark):
    """A zero vector has no cosine direction and never enters; a
    diverse vector OUTSIDE the top-M prefilter pool cannot be picked
    — rerank quality is relative to the retrieved pool by contract."""
    from v3io_tsdb_spark.functions.similarity import mmr_topk

    rows = [
        (1, [0.99, 0.14]),
        (2, [0.99, 0.141]),
        (3, [0.0, 0.0]),      # zero norm
        (4, [0.8, -0.6]),     # diverse but rel 0.8 < clones' 0.99
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(df, [1.0, 0.0], k=3, lam=0.5, prefilter_m=2).collect()
    ids = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 3 not in ids
    assert ids == [1, 2]  # pool is {1, 2}: 4 unreachable, k clipped to pool


def test_mmr_first_pick_uniform_formula(spark):
    """Rank 1 carries max_sim=0 and score=round6(lam*rel) — one
    formula for every rank, which is what the unrolled oracle
    mirrors."""
    from v3io_tsdb_spark.functions.similarity import mmr_topk

    df = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = mmr_topk(df, [1.0, 0.0], k=1, lam=0.7).collect()[0]
    assert r["rank"] == 1 and r["max_sim"] == 0.0
    assert math.isclose(r["mmr_score"], 0.7)


# --------------------------------------------------- FK integrity


def test_referential_orphans_golden(spark):
    """Child rows 10,20(x2),30,NULL against parent {10,20}: 3 orphan
    ROWS over 1 orphan KEY (30), and the NULL key is absent-not-
    dangling (SQL FK semantics) — counted separately, never an
    orphan."""
    from v3io_tsdb_spark.functions.profile import referential_orphans

    child = spark.createDataFrame(
        [(10,), (20,), (20,), (30,), (30,), (30,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(10,), (20,), (99,)], "pk long")
    r = referential_orphans(child, parent, "k", "pk").collect()[0]
    assert r["relation"] == "k->pk"
    assert r["n_child_rows"] == 7 and r["n_null_keys"] == 1
    assert r["n_orphan_rows"] == 3 and r["n_orphan_keys"] == 1


def test_referential_orphans_duplicate_parent_keys_safe(spark):
    """A parent with duplicate keys must not double-count child rows:
    the key set is made distinct BEFORE the anti join (the X39
    build-side-uniqueness rule)."""
    from v3io_tsdb_spark.functions.profile import referential_orphans

    child = spark.createDataFrame([(1,), (2,)], "k long")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
    r = referential_orphans(child, parent, "k", "pk").collect()[0]
    assert r["n_child_rows"] == 2
    assert r["n_orphan_rows"] == 1 and r["n_orphan_keys"] == 1


def test_referential_orphans_broadcasts_small_parent(spark):
    """A dimension-sized parent key set rides a broadcast anti join —
    the fact table never shuffles for the check."""
    from v3io_tsdb_spark.functions.profile import referential_orphans

    child = spark.range(1000).withColumnRenamed("id", "k")
    parent = spark.range(10).withColumnRenamed("id", "pk")
    plan = _plan(referential_orphans(child, parent, "k", "pk"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- stream episodes

HOUR = 3_600_000


def test_stream_alert_episodes_emission_contract(tmp_path, spark):
    """Crafted hourly counts [5,6,1,7,2,8,_,9,...open]: run {0,1}
    emits when non-flagged hour 2 closes; singleton {3} emits when
    hour 4 closes; singleton {5} emits when flagged hour 7 arrives
    past the hole at 6 (terminator AND opener); the {7}-episode is
    still open at stream end and must NOT emit."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_alert_episodes

    counts = {0: 5, 1: 6, 2: 1, 3: 7, 4: 2, 5: 8, 7: 9, 8: 1}
    ev = [("a", h * HOUR + i) for h, n in counts.items() for i in range(n)]
    in_dir = tmp_path / "ep_in"
    in_dir.mkdir()
    (in_dir / "b1.json").write_text(
        "\n".join(json.dumps({"ts": t, "name": n, "value": 0.0})
                  for n, t in ev)
    )
    raw = spark.readStream.schema("ts long, name string, value double").json(
        str(in_dir)
    )
    out = stream_alert_episodes(raw, step_ms=HOUR, threshold=4)
    q = (
        out.writeStream.format("memory").queryName("ep_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ep_ckpt")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        spark.sql("SELECT * FROM ep_out").collect(), key=lambda r: r["start_t"]
    )
    got = [(r["start_t"] // HOUR, r["end_t"] // HOUR, r["n_buckets"], r["peak"])
           for r in rows]
    # open episode at hour 7 withheld; hour 8 is the open bucket
    assert got == [(0, 1, 2, 6), (3, 3, 1, 7), (5, 5, 1, 8)]


def test_stream_alert_episodes_cross_batch_state(tmp_path, spark):
    """An episode spanning two micro-batches emits once, intact: the
    open-episode state carries across the batch boundary."""
    import json

    from v3io_tsdb_spark.streaming.stateful import stream_alert_episodes

    in_dir = tmp_path / "ep2_in"
    in_dir.mkdir()

    def write(fname, counts):
        ev = [("a", h * HOUR + i) for h, n in counts.items() for i in range(n)]
        (in_dir / fname).write_text(
            "\n".join(json.dumps({"ts": t, "name": n, "value": 0.0})
                      for n, t in ev)
        )

    write("b1.json", {0: 5, 1: 6})
    raw = spark.readStream.schema("ts long, name string, value double").json(
        str(in_dir)
    )
    out = stream_alert_episodes(raw, step_ms=HOUR, threshold=4)
    q = (
        out.writeStream.format("memory").queryName("ep2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ep2_ckpt")).start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM ep2_out").count() == 0  # still open
        write("b2.json", {2: 7, 3: 1, 4: 1})  # extends, then terminates
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM ep2_out").collect()
    assert [(r["start_t"] // HOUR, r["end_t"] // HOUR, r["n_buckets"],
             r["peak"]) for r in rows] == [(0, 2, 3, 7)]


# ------------------------------------------------- interval merge


def test_merge_intervals_golden(spark):
    """[1,5)+[3,8)+[8,10) chain into one (touching half-open merges);
    [12,13) stands alone."""
    from v3io_tsdb_spark.operators.intervals import merge_intervals

    df = spark.createDataFrame(
        [(1, 5), (3, 8), (8, 10), (12, 13)], "start long, end long"
    )
    out = sorted(
        merge_intervals(df).collect(), key=lambda r: r["start"]
    )
    assert [(r["start"], r["end"], r["n_merged"], r["covered"])
            for r in out] == [(1, 10, 3, 9), (12, 13, 1, 1)]


def test_merge_intervals_contained_cannot_split(spark):
    """A short interval strictly inside an earlier long one must not
    reset the running coverage end: with lag(end) instead of the
    running max, [2,3) would make [4,12) look disconnected from
    [0,10). The sweep uses max-over-all-priors, so one [0,12) block
    comes out — and a true gap after it still splits."""
    from v3io_tsdb_spark.operators.intervals import merge_intervals

    df = spark.createDataFrame(
        [(0, 10), (2, 3), (4, 12), (13, 14)], "start long, end long"
    )
    out = sorted(merge_intervals(df).collect(), key=lambda r: r["start"])
    assert [(r["start"], r["end"], r["n_merged"]) for r in out] == [
        (0, 12, 3), (13, 14, 1)
    ]


def test_merge_intervals_gap_and_groups(spark):
    """merge_gap bridges holes up to the gap; groups never merge
    across keys."""
    from v3io_tsdb_spark.operators.intervals import merge_intervals

    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 6, 8), ("b", 0, 5)], "g string, start long, end long"
    )
    strict = merge_intervals(df, group_cols=("g",))
    assert strict.count() == 3  # 1-tick hole splits at gap 0
    bridged = sorted(
        merge_intervals(df, group_cols=("g",), merge_gap=1).collect(),
        key=lambda r: (r["g"], r["start"]),
    )
    assert [(r["g"], r["start"], r["end"]) for r in bridged] == [
        ("a", 0, 8), ("b", 0, 5)
    ]


# ------------------------------------------------- split leakage


def test_split_leakage_row_vs_group_contrast(spark):
    """Two users x many rows: a row-keyed split scatters each user
    across splits (leaky); a group-keyed split cannot leak by
    construction — the audit quantifies exactly that contrast."""
    from v3io_tsdb_spark.functions.sampling import assign_split, split_leakage

    rows = [(i, i % 2) for i in range(200)]  # 2 users, 100 rows each
    df = spark.createDataFrame(rows, "row_id long, user long")
    weights = {"train": 0.5, "test": 0.5}
    leaky = split_leakage(
        assign_split(df, "row_id", weights), "user"
    ).collect()[0]
    assert leaky["n_groups"] == 2 and leaky["n_leaky_groups"] == 2
    assert leaky["n_leaky_rows"] == 200 and leaky["leak_frac"] == 1.0
    clean = split_leakage(
        assign_split(df, "user", weights), "user"
    ).collect()[0]
    assert clean["n_leaky_groups"] == 0 and clean["n_leaky_rows"] == 0
    assert clean["leak_frac"] == 0.0


def test_split_leakage_counts_rows_of_leaky_groups(spark):
    """A leaky group contributes ALL its rows to n_leaky_rows (any
    of them could carry memorized eval content), not just the
    minority-split ones."""
    from v3io_tsdb_spark.functions.sampling import split_leakage

    df = spark.createDataFrame(
        [("u1", "train"), ("u1", "train"), ("u1", "test"),
         ("u2", "train")],
        "user string, split string",
    )
    r = split_leakage(df, "user").collect()[0]
    assert r["n_rows"] == 4 and r["n_groups"] == 2
    assert r["n_leaky_groups"] == 1 and r["n_leaky_rows"] == 3
    assert math.isclose(r["leak_frac"], 0.75)


def test_split_leakage_no_expand_single_distinct(spark):
    """One distinct aggregate per group -> no Expand node; the
    group reduce carries map-side partials."""
    from v3io_tsdb_spark.functions.sampling import split_leakage

    df = spark.createDataFrame([("u", "train")], "user string, split string")
    plan = _plan(split_leakage(df, "user"))
    assert "Expand" not in plan, plan[:1200]


# ------------------------------------------------- KS drift


def test_ks_identical_samples_zero(spark):
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    a = spark.createDataFrame([(float(i % 5),) for i in range(20)], "value double")
    r = ks_2sample(a, a, "value").collect()[0]
    assert r["ks_d"] == 0.0 and r["reject"] == 0


def test_ks_hand_computed_with_cross_side_tie(spark):
    """a={1,2}, b={2,3}: ECDFs step at 1,2,3 -> F_a=(.5,1,1),
    F_b=(0,.5,1), D=0.5; the shared value 2 must aggregate counts
    from BOTH sides at one step."""
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    a = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "value double")
    r = ks_2sample(a, b, "value").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert math.isclose(r["ks_d"], 0.5)


def test_ks_disjoint_rejects_at_scale(spark):
    """Fully shifted samples: D=1; with 30 per side the Smirnov bound
    (~0.35) rejects. With only 3 per side the SAME D=1 does NOT
    reject — the flag carries the sample-size honesty."""
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    big_a = spark.createDataFrame([(float(i),) for i in range(30)], "value double")
    big_b = spark.createDataFrame([(100.0 + i,) for i in range(30)], "value double")
    r = ks_2sample(big_a, big_b, "value").collect()[0]
    assert r["ks_d"] == 1.0 and r["reject"] == 1
    small_a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "value double")
    small_b = spark.createDataFrame([(11.0,), (12.0,), (13.0,)], "value double")
    r2 = ks_2sample(small_a, small_b, "value").collect()[0]
    assert r2["ks_d"] == 1.0 and r2["reject"] == 0


def test_ks_empty_side_no_verdict(spark):
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    a = spark.createDataFrame([(1.0,)], "value double")
    b = spark.createDataFrame([], "value double")
    r = ks_2sample(a, b, "value").collect()[0]
    assert r["ks_d"] is None and r["reject"] is None


def test_ks_reduces_before_ordered_pass(spark):
    """The distinct-value reduce happens BEFORE the cumulative
    window: no join, and the first aggregate carries map-side
    partials so nothing raw-sized ever sorts."""
    from v3io_tsdb_spark.functions.histogram import ks_2sample

    a = spark.createDataFrame([("m", 1.0)], "name string, value double")
    plan = _plan(ks_2sample(a, a, "value", group_cols=("name",)))
    assert "Join" not in plan, plan[:800]
    assert "partial_sum" in plan or "HashAggregate" in plan


# ------------------------------------------------- absent()


def test_absent_buckets_golden(spark):
    """Metric m reports hours 0,1,3 of a 0-4 window: absent rows are
    exactly hours 2 and 4; a second metric with full coverage emits
    nothing; a NEVER-seen metric cannot (the PromQL blind spot,
    documented)."""
    from v3io_tsdb_spark.operators.gaps import absent_buckets

    rows = [("m", h * HOUR) for h in (0, 1, 3)] + [
        ("k", h * HOUR) for h in range(5)
    ]
    df = spark.createDataFrame(rows, "name string, ts long")
    out = sorted(
        absent_buckets(df, ("name",), "ts", HOUR, 0, 4 * HOUR).collect(),
        key=lambda r: (r["name"], r["t"]),
    )
    assert [(r["name"], r["t"] // HOUR, r["absent"]) for r in out] == [
        ("m", 2, 1), ("m", 4, 1)
    ]


def test_absent_buckets_generated_not_exploded(spark):
    """The expected grid comes from a sequence() over the DISTINCT
    series set — the plan carries a Generate over the reduced keys
    and an anti join, never a data-sized explode."""
    from v3io_tsdb_spark.operators.gaps import absent_buckets

    df = spark.createDataFrame([("m", 0)], "name string, ts long")
    plan = _plan(absent_buckets(df, ("name",), "ts", HOUR, 0, 4 * HOUR))
    assert "Generate explode" in plan, plan[:1500]
    assert "LeftAnti" in plan, plan[:1500]


# ------------------------------------------------- stream SLO burn


def test_stream_slo_burn_matches_batch_on_closed(tmp_path, spark):
    """The streaming ring replays the batch RANGE frames: a quiet
    hour must contribute NOTHING to the long window (gap-safety) and
    every closed bucket's burn pair matches the batch operator
    bit-for-bit; the open last bucket is withheld."""
    import json

    from v3io_tsdb_spark.operators.counters import slo_burn_rate
    from v3io_tsdb_spark.streaming.stateful import stream_slo_burn

    # hours 0,1,2 then a HOLE at 3, then 4,5; hour 5 stays open
    counts = {0: (1, 4), 1: (4, 4), 2: (0, 4), 4: (4, 4), 5: (1, 2)}
    ev = []
    for h, (err, tot) in counts.items():
        ev += [("error", h * HOUR + i) for i in range(err)]
        ev += [("view", h * HOUR + 1000 + i) for i in range(tot - err)]
    in_dir = tmp_path / "slo_in"
    in_dir.mkdir()
    (in_dir / "b.json").write_text(
        "\n".join(json.dumps({"ts": t, "name": n, "value": 0.0})
                  for n, t in sorted(ev, key=lambda x: x[1]))
    )
    raw = spark.readStream.schema("ts long, name string, value double").json(
        str(in_dir)
    )
    out = stream_slo_burn(raw, step_ms=HOUR, short_buckets=1,
                          long_buckets=3, slo_target=0.75,
                          burn_threshold=1.0)
    q = (out.writeStream.format("memory").queryName("slo_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "slo_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["t"] // HOUR: r for r in spark.sql("SELECT * FROM slo_out").collect()}
    assert set(got) == {0, 1, 2, 4}  # hour 5 open; hole at 3 never existed
    batch_in = spark.createDataFrame(
        [(n, t) for n, t in ev], "name string, t long"
    )
    want = {r["t"] // HOUR: r for r in slo_burn_rate(
        batch_in, error_name="error", ts_col="t", step_ms=HOUR,
        from_ms=0, short_buckets=1, long_buckets=3, slo_target=0.75,
        burn_threshold=1.0,
    ).collect() if r["t"] // HOUR != 5}
    assert set(want) == set(got)
    for h in got:
        g, w = got[h], want[h]
        assert (g["errors"], g["total"]) == (w["errors"], w["total"])
        assert g["burn_short"] == w["burn_short"]
        assert g["burn_long"] == w["burn_long"]
        assert g["page"] == w["page"]
    # the hole: hour 4's long window spans hours 2-4 but only 2 and 4
    # exist -> (0+4)/(4+4)/0.25 = 2.0, NOT diluted by a phantom hour 3
    assert got[4]["burn_long"] == 2.0


# ------------------------------------------------- indexed PMI


def test_cooccur_pmi_indexed_equals_recompute(tmp_path, spark):
    """The persisted-shingle-index serving path must return exactly
    the recompute path's rows (the X18 equivalence contract, applied
    to PMI like winnow/jaccard/minhash before it)."""
    from v3io_tsdb_spark.functions.dedup import (
        read_shingle_index, shingle_write_index,
    )
    from v3io_tsdb_spark.functions.text import cooccur_pmi

    docs = spark.createDataFrame(
        [(i, ("alpha beta gamma delta " * 3) + f"tail{i % 2}")
         for i in range(8)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sh_idx")
    shingle_write_index(docs, path)
    kw = dict(min_df=2, max_df=8, min_pair=2)
    direct = {(r["term_a"], r["term_b"]): r for r in
              cooccur_pmi(docs, **kw).collect()}
    indexed = {(r["term_a"], r["term_b"]): r for r in
               cooccur_pmi(docs, inv=read_shingle_index(spark, path),
                           **kw).collect()}
    assert set(direct) == set(indexed) and len(direct) > 0
    for k in direct:
        assert direct[k]["c_ab"] == indexed[k]["c_ab"]
        assert direct[k]["pmi"] == indexed[k]["pmi"]


# ------------------------------------------------- Holt-Winters


def test_hw_pure_seasonal_tracked_exactly(spark):
    """A trendless perfectly 7-periodic series is a fixed point of
    the recursion: the classical init recovers level = template mean,
    trend = 0, seasonals = deviations, and every later state update
    leaves them unchanged — so fitted == actual with ZERO residual at
    every step, and the forecast is the next phase's template value.
    This exercises all three update equations at once."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    tmpl = [10.0, 20.0, 15.0, 30.0, 5.0, 25.0, 35.0]
    rows = [("m", d * DAY, tmpl[d % 7]) for d in range(21)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = sorted(holt_winters(
        df, series_cols=("name",), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=21, period=7,
    ).collect(), key=lambda r: r["t"])
    assert len(out) == 14                      # t = 7..20
    for r in out:
        d = r["t"] // DAY
        assert r["fitted"] == tmpl[d % 7]
        assert r["residual"] == 0.0
    assert out[-1]["forecast"] == tmpl[21 % 7]
    assert all(r["forecast"] is None for r in out[:-1])


def test_hw_dense_grid_contract_drops_gappy_series(spark):
    """A series missing one bucket is DROPPED, not silently slid
    over: HW's seasonal rotation is undefined across holes."""
    from v3io_tsdb_spark.operators.trend import holt_winters

    full = [("ok", d * DAY, float(d)) for d in range(21)]
    gappy = [("gap", d * DAY, float(d)) for d in range(21) if d != 9]
    df = spark.createDataFrame(full + gappy, "name string, t long, value double")
    out = holt_winters(
        df, series_cols=("name",), ts_col="t", value_col="value",
        step_ms=DAY, from_ms=0, n_buckets=21, period=7,
    ).collect()
    assert {r["name"] for r in out} == {"ok"}


# ------------------------------------------------- edge cases


def test_hw_rejects_insufficient_history(spark):
    """n_buckets < 2*period would average a PARTIAL second season by
    m on one engine and by its true count on another — refused at
    call time instead of silently diverging."""
    import pytest

    from v3io_tsdb_spark.operators.trend import holt_winters

    df = spark.createDataFrame([("m", 0, 1.0)], "name string, t long, value double")
    with pytest.raises(ValueError, match="2\\*period"):
        holt_winters(df, series_cols=("name",), ts_col="t",
                     value_col="value", step_ms=DAY, from_ms=0,
                     n_buckets=10, period=7)


def test_table_profile_empty_frame(spark):
    from v3io_tsdb_spark.functions.profile import table_profile

    df = spark.createDataFrame([], "id long, s string")
    out = {r["column"]: r for r in table_profile(df).collect()}
    assert out["id"]["n_rows"] == 0 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 0
    assert out["id"]["min_num"] is None and out["s"]["max_str"] is None


def test_referential_orphans_empty_child(spark):
    from v3io_tsdb_spark.functions.profile import referential_orphans

    child = spark.createDataFrame([], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    r = referential_orphans(child, parent, "k", "pk").collect()[0]
    assert r["n_child_rows"] == 0 and r["n_orphan_rows"] == 0
    assert r["n_orphan_keys"] == 0


def test_km_conversion_nobody_in_study(spark):
    """Every first event after the horizon: the study is empty and
    the curve has no rows (not a crash, not a null row)."""
    from v3io_tsdb_spark.operators.cohorts import kaplan_meier_conversion

    df = spark.createDataFrame(
        [(1, 10 * DAY, "view")], "user_id long, ts_ms long, event_type string"
    )
    assert kaplan_meier_conversion(df, horizon_ms=7 * DAY).count() == 0


def test_mmr_lambda_zero_pure_diversity(spark):
    """lam=0: after the relevance-seeded first pick, each step takes
    the candidate FARTHEST from the selected set (score = -max_sim)."""
    from v3io_tsdb_spark.functions.similarity import mmr_topk

    rows = [
        (1, [1.0, 0.0]),     # picked first (closest to query)
        (2, [0.999, 0.04]),  # clone of 1
        (3, [0.0, 1.0]),     # orthogonal to 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(mmr_topk(df, [1.0, 0.0], k=2, lam=0.0).collect(),
                 key=lambda r: r["rank"])
    assert [r["vec_id"] for r in out] == [1, 3]


def test_offset_compare_series_isolation(spark):
    """A prior bucket from ANOTHER series must never serve as prev."""
    from v3io_tsdb_spark.operators.trend import offset_compare

    df = spark.createDataFrame(
        [("a", "u", 0, 1.0), ("b", "u", 7 * DAY, 9.0)],
        "name string, uid string, t long, value double",
    )
    out = {(r["name"], r["t"] // DAY): r for r in offset_compare(
        df, series_cols=("name", "uid"), ts_col="t", step_ms=DAY,
        from_ms=0, offset_buckets=7,
    ).collect()}
    assert out[("b", 7)]["prev"] is None
