"""Round-11 goldens: stream_topk twin, Q21 sole-blame semi+anti
composition, Q20 nested-IN/correlated-share shape."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

DAY = 86_400_000


# ---------------------------------------------------- stream topk


def _run_topk(spark, tmp_path, rows, k=3):
    from v3io_tsdb_spark.streaming.stateful import stream_topk

    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(
        rows, "ts long, name string, uid string, value double"
    ).orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema(
        "ts long, name string, uid string, value double"
    ).parquet(src)
    q = (
        stream_topk(raw, step_ms=DAY, k=k)
        .writeStream.format("memory").queryName("tk_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from tk_out").collect()
    return sorted(out, key=lambda r: (r["series_key"], r["t"], r["rank"]))


def test_stream_topk_ranks_closed_bucket_only(tmp_path, spark):
    """Day 0 holds four uids; one day-1 event closes it. The top 3
    emit ranked by bucket mean desc; day 1 stays open (no rows)."""
    rows = [
        (100, "m", "a", 5.0),
        (200, "m", "b", 9.0),
        (300, "m", "c", 7.0),
        (400, "m", "d", 1.0),
        (DAY + 100, "m", "a", 2.0),
    ]
    out = _run_topk(spark, tmp_path, rows)
    assert [(r["t"] // DAY, r["rank"], r["uid"], r["x"]) for r in out] == [
        (0, 1, "b", 9.0), (0, 2, "c", 7.0), (0, 3, "a", 5.0),
    ]


def test_stream_topk_bucket_mean_and_uid_tiebreak(tmp_path, spark):
    """Multiple events per uid average within the bucket; equal
    rounded means rank by uid ascending (the batch tie rule)."""
    rows = [
        (100, "m", "b", 4.0), (200, "m", "b", 8.0),  # mean 6
        (300, "m", "a", 6.0),                        # mean 6 (tie)
        (400, "m", "c", 5.0),
        (DAY, "m", "a", 0.0),
    ]
    out = _run_topk(spark, tmp_path, rows, k=2)
    assert [(r["rank"], r["uid"], r["x"]) for r in out] == [
        (1, "a", 6.0), (2, "b", 6.0),
    ]


def test_stream_topk_cross_batch_state(tmp_path, spark):
    """An open bucket's uid->(sum, n) map persists in the state store
    across micro-batches: batch 1 leaves day 0 open, batch 2 adds to
    it and then closes it — the emitted means combine both batches."""
    from v3io_tsdb_spark.streaming.stateful import stream_topk

    in_dir = tmp_path / "tk_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "tk_ckpt")
    (in_dir / "b1.json").write_text(
        "\n".join(json.dumps(d) for d in [
            {"ts": 100, "name": "m", "uid": "a", "value": 4.0},
            {"ts": 200, "name": "m", "uid": "b", "value": 1.0},
        ])
    )
    raw = spark.readStream.schema(
        "ts long, name string, uid string, value double"
    ).json(str(in_dir))
    q = (
        stream_topk(raw, step_ms=DAY, k=2)
        .writeStream.format("memory").queryName("tk_xb")
        .outputMode("append").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        (in_dir / "b2.json").write_text(
            "\n".join(json.dumps(d) for d in [
                {"ts": 300, "name": "m", "uid": "a", "value": 8.0},
                {"ts": DAY + 1, "name": "m", "uid": "a", "value": 0.0},
            ])
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = sorted(
        spark.sql("select * from tk_xb").collect(), key=lambda r: r["rank"]
    )
    # a: (4+8)/2 = 6 across batches; b: 1 from batch 1's state
    assert [(r["rank"], r["uid"], r["x"]) for r in out] == [
        (1, "a", 6.0), (2, "b", 1.0),
    ]


# ------------------------------------------------------- Q21 shape


def _fake_q21_dir(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        # (orderkey, suppkey, returnflag)
        [(1, 1, "R"), (1, 2, "N"),          # sole blame: supp 1
         (2, 1, "R"), (2, 2, "R"),          # both returned: nobody
         (3, 1, "R"),                        # single-supplier: nobody
         (4, 3, "R"), (4, 4, "N")],          # order open: nobody
        "l_orderkey long, l_suppkey long, l_returnflag string",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "O")],
        "o_orderkey long, o_orderstatus string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(i, f"S{i}", 0) for i in (1, 2, 3, 4)],
        "s_suppkey long, s_name string, s_nationkey int",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    spark.createDataFrame(
        [(0, "NATION_0", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(os.path.join(d, "nation.parquet"))
    return d


def test_q21_sole_blame_fanout_rules(tmp_path, spark):
    """Blame requires ALL THREE quantifiers: returned line + finalized
    order + another supplier present + no OTHER supplier returned.
    Each fake order knocks out exactly one rule."""
    import __spark_entry__ as E

    d = _fake_q21_dir(spark, tmp_path)
    out = E.queries()["tpch_q21_sole_blame"](spark, d).collect()
    assert [(r["s_name"], r["n_name"], r["numwait"]) for r in out] == [
        ("S1", "NATION_0", 1)
    ]


def test_q21_counts_order_once_not_per_line(tmp_path, spark):
    """Two returned lines by the same supplier in one qualifying order
    count ONE waiting order (count distinct, not join fan-out)."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, 1, "R"), (1, 1, "R"), (1, 2, "N")],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "F")], "o_orderkey long, o_orderstatus string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(1, "S1", 0), (2, "S2", 0)],
        "s_suppkey long, s_name string, s_nationkey int",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    spark.createDataFrame(
        [(0, "NATION_0", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(os.path.join(d, "nation.parquet"))
    out = E.queries()["tpch_q21_sole_blame"](spark, d).collect()
    assert [(r["s_name"], r["numwait"]) for r in out] == [("S1", 1)]


def test_q21_plan_has_semi_and_anti(spark):
    """The two opposite-polarity quantifiers compile to LeftSemi AND
    LeftAnti joins in one plan — the shape this row exists for."""
    import __spark_entry__ as E

    plan = E.queries()["tpch_q21_sole_blame"](spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan


# ------------------------------------------------------- Q20 shape


def _fake_q20_dir(spark, tmp_path):
    d = str(tmp_path / "sf")
    rows = [
        # part 10 ('spring', matches): supp 1 ships 60, supp 2 ships 40
        (10, 1, 60.0, "1996-03-01"),
        (10, 2, 40.0, "1996-04-01"),
        # out-of-year volume must not count toward the share
        (10, 2, 1000.0, "1995-03-01"),
        # part 30 ('steel', matches): exactly half is NOT enough
        (30, 3, 50.0, "1996-05-01"),
        (30, 4, 50.0, "1996-06-01"),
        # part 20 ('metal', name filtered out): sole supplier ignored
        (20, 5, 100.0, "1996-07-01"),
    ]
    spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_quantity double, l_d string"
    ).select(
        "l_partkey", "l_suppkey", "l_quantity",
        F.col("l_d").cast("timestamp_ntz").alias("l_shipdate"),
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "spring"), (20, "metal"), (30, "steel")],
        "p_partkey long, p_name string",
    ).write.parquet(os.path.join(d, "part.parquet"))
    spark.createDataFrame(
        [(i, f"S{i}", 10.0 * i) for i in (1, 2, 3, 4, 5)],
        "s_suppkey long, s_name string, s_acctbal double",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    return d


def test_q20_share_threshold_rules(tmp_path, spark):
    """Only the supplier with MORE than half a qualifying part's
    in-year volume survives: exactly-half loses, out-of-year volume
    is excluded from both sides, name-filtered parts never qualify."""
    import __spark_entry__ as E

    d = _fake_q20_dir(spark, tmp_path)
    out = E.queries()["tpch_q20_share_suppliers"](spark, d).collect()
    assert [(r["s_suppkey"], r["s_name"], r["s_acctbal"]) for r in out] == [
        (1, "S1", 10.0)
    ]


def test_q20_plan_semi_join_no_second_fact_scan(spark):
    """Supplier joins the qualifying keys as LeftSemi, and the
    per-part totals derive from the CHECKPOINTED pair aggregate
    (ExistingRDD), never a second lineitem scan — the fact is read
    exactly once, inside the checkpoint job."""
    import __spark_entry__ as E

    plan = E.queries()["tpch_q20_share_suppliers"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert plan.count("lineitem.parquet") == 0  # served from the pair panel
    assert "ExistingRDD" in plan


# ------------------------------------------------------- Q2 shape


def test_q2_argmin_ties_and_size_filter(tmp_path, spark):
    """Two suppliers at the SAME (rounded) minimum price both emit;
    the higher-priced supplier never does; wrong-size parts are
    pruned before the fact ever aggregates."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(10, 1, 100.0), (10, 2, 100.0), (10, 3, 250.0),
         (20, 4, 5.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "B1", 2), (20, "B2", 9)],
        "p_partkey long, p_brand string, p_size int",
    ).write.parquet(os.path.join(d, "part.parquet"))
    spark.createDataFrame(
        [(i, f"S{i}") for i in (1, 2, 3, 4)],
        "s_suppkey long, s_name string",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    out = sorted(
        E.queries()["tpch_q2_min_price"](spark, d).collect(),
        key=lambda r: r["s_name"],
    )
    assert [(r["p_partkey"], r["s_name"], r["min_price"]) for r in out] == [
        (10, "S1", 100.0), (10, "S2", 100.0),
    ]


def test_q2_distinct_collapses_repeat_min_lines(tmp_path, spark):
    """One supplier hitting the min price on THREE lines emits one
    row (DISTINCT on the achieving pair, not line fan-out)."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(10, 1, 50.0), (10, 1, 50.0), (10, 1, 50.0), (10, 2, 60.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "B1", 2)], "p_partkey long, p_brand string, p_size int",
    ).write.parquet(os.path.join(d, "part.parquet"))
    spark.createDataFrame(
        [(1, "S1"), (2, "S2")], "s_suppkey long, s_name string",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    out = E.queries()["tpch_q2_min_price"](spark, d).collect()
    assert [(r["s_name"], r["min_price"]) for r in out] == [("S1", 50.0)]


# ------------------------------------------------------- Q22 shape


def test_q22_boundary_and_anti_rules(tmp_path, spark):
    """Exactly-average balance is excluded (strict >); an above-avg
    customer with a recent order is excluded by the anti-join; the
    average is over POSITIVE balances only."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    # positive balances: 100, 200, 300 -> avg 200. The -1000 customer
    # must not drag the average down.
    spark.createDataFrame(
        [(1, "A", 100.0), (2, "A", 200.0), (3, "A", 300.0),
         (4, "B", 250.0), (5, "B", -1000.0)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    ).write.parquet(os.path.join(d, "customer.parquet"))
    # customer 4 (above avg) ordered recently -> anti-joined away
    spark.createDataFrame(
        [(4, "2000-06-01"), (3, "1999-01-01")],
        "o_custkey long, o_d string",
    ).select(
        "o_custkey", F.col("o_d").cast("timestamp_ntz").alias("o_orderdate")
    ).write.parquet(os.path.join(d, "orders.parquet"))
    out = E.queries()["tpch_q22_idle_rich"](spark, d).collect()
    # only customer 3 survives: above 200, no order on/after 2000-01-01
    assert [(r["c_mktsegment"], r["numcust"], r["totacctbal"])
            for r in out] == [("A", 1, 300.0)]


def test_q22_plan_anti_join_and_broadcast_scalar(spark):
    import __spark_entry__ as E

    plan = E.queries()["tpch_q22_idle_rich"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------------- Q13 shape


def test_q13_zero_order_customers_survive(tmp_path, spark):
    """The outer join preserves customers with NO qualifying orders —
    the zero bucket is data (the Q13 point), and the priority filter
    lives INSIDE the join condition: customer 3's only order is
    non-urgent, so they land in the zero bucket, not dropped."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")],
        "c_custkey long, c_name string",
    ).write.parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(100, 1, "1-URGENT"), (101, 1, "1-URGENT"), (102, 3, "3-MEDIUM")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    out = {r["c_count"]: r["custdist"]
           for r in E.queries()["tpch_q13_custdist"](spark, d).collect()}
    assert out == {2: 1, 0: 2}  # cust 1 -> 2 urgent; cust 2 and 3 -> 0


# ------------------------------------------------------- Q11 shape


def test_q11_share_is_exact_decimal(tmp_path, spark):
    """The group-vs-global comparison runs entirely in decimal:
    three parts at 30/30/40 of a 100 total with threshold 1/1250 —
    all pass; raise one part to dominate and shrink another below
    0.08% and only the big ones survive. A part at EXACTLY the
    threshold does NOT pass (strict >, exact integer decimal)."""
    import __spark_entry__ as E

    d = str(tmp_path / "sf")
    # revenues: 1249 parts' worth concentrated in part 1 (1249.0),
    # part 2 exactly 1.0 of total 1250 -> 1250*1.0 == 1250.0 exactly
    # at the boundary -> excluded by strict >
    spark.createDataFrame(
        [(1, 1249.0, 0.0), (2, 1.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    out = E.queries()["tpch_q11_share_parts"](spark, d).collect()
    assert [(r["l_partkey"], r["revenue"]) for r in out] == [(1, 1249.0)]


def test_q11_plan_single_fact_scan_broadcast_total(spark):
    """The global total derives from the checkpointed per-part panel
    (ExistingRDD) — one fact scan — and arrives as a broadcast."""
    import __spark_entry__ as E

    plan = E.queries()["tpch_q11_share_parts"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 0
    assert "ExistingRDD" in plan and "Broadcast" in plan


# --------------------------------------------------- cube pre-agg


def test_cube_pricing_expands_panel_not_fact(spark):
    """The r11 pre-aggregate-then-cube rewrite: Expand's input is the
    finest-group aggregate, never the raw fact — an HashAggregate
    must sit between Expand and the scan (Spark's raw CUBE replicates
    every fact row once per grouping set before any aggregation)."""
    import __spark_entry__ as E

    plan = E.queries()["tpch_cube_pricing"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    i_expand = plan.index("Expand")
    i_scan = plan.index("FileScan")
    assert i_expand < i_scan  # tree prints parent-first
    assert "HashAggregate" in plan[i_expand:i_scan]


# --------------------------------------- r11 hardening properties


def test_hw_anomaly_single_spike_isolation_property(spark):
    """PROPERTY (deterministic sweep over spike positions): on a
    clean 7-periodic series, a single +300 spike anywhere past the
    init window flags exactly that bucket, and every later residual
    is 0 — the filter-side rejection contract, independent of spike
    phase."""
    from v3io_tsdb_spark.operators.trend import hw_anomaly

    tmpl = [12.0, 25.0, 18.0, 31.0, 7.0, 22.0, 36.0]
    for spike_day in (15, 19, 24):  # three phases, incl. last week
        rows = [
            ("m", d * DAY, tmpl[d % 7] + (300.0 if d == spike_day else 0.0))
            for d in range(28)
        ]
        df = spark.createDataFrame(
            rows, "name string, t long, value double"
        )
        out = {r["t"] // DAY: r for r in hw_anomaly(
            df, series_cols=("name",), ts_col="t", value_col="value",
            step_ms=DAY, from_ms=0, n_buckets=28, period=7, k=3.0,
        ).collect()}
        flagged = sorted(d for d, r in out.items() if r["flag"] == 1)
        assert flagged == [spike_day], (spike_day, flagged)
        assert all(out[d]["residual"] == 0.0
                   for d in range(spike_day + 1, 28)), spike_day


def test_pca_gram_and_explode_paths_agree(spark):
    """The two covariance plans are the SAME sums: gram partials and
    double-posexplode must produce bit-identical components on a
    non-trivial corpus (the contract that made the swap safe)."""
    from v3io_tsdb_spark.functions.similarity import pca_top_component

    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, pca_top_component(
        emb, dim=8, n_iter=4, gram_partials=True).collect()))
    b = sorted(map(tuple, pca_top_component(
        emb, dim=8, n_iter=4, gram_partials=False).collect()))
    assert a == b
