"""Physical-plan audits for the training-pipeline operators: the
properties that make them survive 100x data are asserted on the plan
itself, not inferred from small-scale timings (SCALE.md)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval/benchmark side must broadcast: the corpus side streams
    map-side with no shuffle before the per-doc aggregate."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.dedup import decontaminate

    docs = load_table(spark, SF, "documents")
    out = decontaminate(docs.where(F.col("doc_id") % 10 != 3),
                        docs.where(F.col("doc_id") % 10 == 3), n=8)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_indexed_sketches_never_touch_text(spark, tmp_path):
    """Sketch queries served from the persisted shingle index must not
    re-read or re-shingle the raw text: no regex split, no md5, and no
    scan of the documents table in the plan."""
    from pyspark.sql.functions import broadcast  # noqa: F401
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.dedup import (
        minhash_dedup,
        ngram_jaccard_pairs,
        read_shingle_index,
        shingle_write_index,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "shidx")
    shingle_write_index(docs, path)
    inv = read_shingle_index(spark, path)

    for df in (
        minhash_dedup(docs, threshold=0.5, inv=inv),
        simhash_near_dup_pairs(docs, max_hamming=3, inv=inv),
    ):
        plan = _plan(df)
        assert "split(" not in plan and "md5(" not in plan
        assert "documents.parquet" not in plan
    # jaccard keeps the corpus handle ONLY for the rare hot-pair verify
    # branch; when no shingle exceeds the cap the executed plan reads
    # just the index
    jac = ngram_jaccard_pairs(docs, threshold=0.5, max_df=100, inv=inv)
    plan = _plan(jac)
    assert "split(" not in plan and "documents.parquet" not in plan


def test_deterministic_sample_is_scan_side_filter(spark):
    """The hash-sample predicate evaluates inside the scan stage (a
    Filter over the file scan — no shuffle, no Python), so at 100 TB
    the sample never materializes the unsampled table."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.sampling import deterministic_sample

    ev = load_table(spark, SF, "events")
    out = deterministic_sample(ev, 0.1, "event_id")
    plan = _plan(out)
    assert "Filter" in plan and "Exchange" not in plan and "BatchEvalPython" not in plan


def test_corpus_pipeline_plan_shape(spark):
    """The composed pipeline must stay one declarative plan with the
    documented shuffle budget: eval-shingle decontamination broadcasts
    (never sort-merge), and the percentile profile aggregates with a
    bounded sketch (percentile_approx), not an exact value buffer."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.pipeline import corpus_pipeline

    docs = load_table(spark, SF, "documents")
    out = corpus_pipeline(
        docs.where(F.col("doc_id") % 10 != 3),
        docs.where(F.col("doc_id") % 10 == 3),
        materialize_kept=False,  # audit the full declarative plan
    )
    plan = _plan(out)
    # the huge fan-out join (corpus shingles x eval shingles) must
    # broadcast the eval side — a shuffle there moves the whole exploded
    # corpus; the doc_id semi/anti joins SHOULD shuffle (keepers is
    # corpus-sized, not broadcastable at scale)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # exact dedup aggregates map-side before its shuffle
    assert "partial_min" in plan or "HashAggregate" in plan


def test_token_quantiles_uses_sketch_not_buffer(spark):
    """doc_token_quantiles must aggregate via the fixed-size
    percentile_approx sketch — the exact `percentile` aggregator
    buffers every group value and OOMs a billion-row language group."""
    import __spark_entry__ as E

    df = E.queries()["doc_token_quantiles"](spark, SF)
    plan = _plan(df)
    assert "approx_percentile" in plan or "percentile_approx" in plan
    assert "percentile(" not in plan


def test_raw_select_pushes_time_and_name_to_scan(spark):
    """S4/P2/P3 audited plan properties, pinned: the Querier's ms time
    clamp must be mirrored onto the native ts column and reach the
    Parquet scan (row-group/page pruning), together with the
    name-equality fast path and the label filter — in EVERY ts dtype
    the driver has shipped. ReadSchema must not include unused columns
    (props, event_id)."""
    import re

    import __spark_entry__ as E

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = E.queries()["tsdb_raw_filter"](spark, SF)
        plan = _plan(df)
        m = re.search(r"PushedFilters: \[[^\]]*\]", plan)
        assert m, "no PushedFilters section in scan"
        pushed = m.group(0)
        assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed, pushed
        assert "In(event_type" in pushed or "EqualTo(event_type" in pushed, pushed
        assert "IsNotNull(user_id)" in pushed, pushed
        schema = re.search(r"ReadSchema: \S+", plan).group(0)
        assert "props" not in schema and "event_id" not in schema, schema
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_rollup_query_never_scans_samples(spark):
    """A1/A2 router, pinned: when the rollup table can answer
    (functions subset, step/gran >= coefficient), the plan reads ONLY
    the persisted rollup files — the raw events scan must not appear."""
    import re

    import __spark_entry__ as E

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = E.queries()["tsdb_rollup_daily"](spark, SF)
        plan = _plan(df)
        locs = re.findall(r"InMemoryFileIndex\(\d+ paths\)\[[^\]]{0,200}", plan)
        assert locs, "no file scans found in plan"
        assert all("rollup" in loc for loc in locs), locs
        assert not any("events.parquet" in loc for loc in locs), locs
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_aqe_splits_skewed_join(spark, tmp_path):
    """Skew posture: with AQE on, a sort-merge join whose left side is
    dominated by one hot key is re-planned at runtime into skew-split
    tasks (`isSkew=true` on the join) instead of one straggler task —
    the mechanism SCALE.md relies on for label-skewed series joins at
    100 TB. Thresholds are lowered so the 200k-row fixture trips the
    same code path production data would."""
    import pyspark.sql.functions as SF_  # noqa: N812

    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    # 95% of left rows share key 0; right side uniform so the join
    # cannot broadcast (forced by threshold below).
    spark.range(0, 200_000).select(
        SF_.when(SF_.col("id") % 20 != 0, SF_.lit(0)).otherwise(SF_.col("id") % 100)
        .alias("k"),
        SF_.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(left_path)
    spark.range(0, 100).select(
        SF_.col("id").alias("k"), SF_.lit("dim").alias("tag")
    ).write.mode("overwrite").parquet(right_path)

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # splitting the skewed side breaks the join's output partitioning;
        # allow AQE to take that trade (the default refuses whenever a
        # downstream stage could have reused it)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "k"
        )
        joined.collect()  # AQE final plan exists only after execution
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_token_chunks_has_no_shuffle(spark):
    """Chunking is scan-side row expansion: zero Exchange in the plan,
    and the whole expansion stays inside whole-stage codegen."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.chunking import token_chunks

    out = token_chunks(load_table(spark, SF, "documents"), chunk=64, stride=48)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "*(" in plan  # whole-stage-codegen stage markers


def test_quality_rules_has_no_shuffle(spark):
    """The rule suite (including the top-unigram fraction) is pure
    per-row column work: no Exchange, no explode-induced join."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import quality_rules

    plan = _plan(quality_rules(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_dup_span_stats_shuffles_only_on_span_hash(spark):
    """Span dedup is one aggregate + one equi-join on the md5 span key
    plus the per-doc reduce and outer join back to ids: hash-partition
    exchanges only — no broadcast-nested-loop, no cartesian, and no
    whole-table sort."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.chunking import dup_span_stats

    plan = _plan(dup_span_stats(load_table(spark, SF, "documents"), n=8))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every shuffle is hash partitioning (no rangepartitioning = no
    # global sort of the span table); broadcasts are fine (small sides)
    for line in plan.splitlines():
        if ("Exchange" in line and "Reused" not in line
                and "BroadcastExchange" not in line):
            assert "hashpartitioning" in line or "SinglePartition" in line, line


def test_dup_span_join_build_side_unique(spark):
    """The join back on span_hash (`chunking.py:71`) is the one
    skew-sensitive step in dup_span_stats (SCALE.md §5a): AQE skew-split
    is safe there ONLY because the build side carries exactly one row
    per join key. Pin that invariant: the plan's join on `_h` consumes
    the `HashAggregate(keys=[_h...])` output directly (so build-side
    uniqueness holds by construction at any scale), and the data agrees
    at fixture scale."""
    import re

    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.chunking import dup_span_stats

    docs = load_table(spark, SF, "documents")
    plan = _plan(dup_span_stats(docs, n=8))
    # the aggregate keyed on the span hash exists and is the only
    # producer of the join's build side
    assert re.search(r"HashAggregate\(keys=\[_h", plan), plan[:1500]
    # a join on _h is present (AQE may pick SMJ or SHJ at scale)
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[_h", plan), (
        plan[:1500]
    )
    # data-level: one row per key on the build side by construction
    from pyspark.sql import functions as SF_  # noqa: N812

    from v3io_tsdb_spark.functions.chunking import _span_hashes
    from v3io_tsdb_spark.functions.text import tokens_col

    toks = docs.select(
        SF_.col("doc_id"), tokens_col(SF_.lower(SF_.col("text"))).alias("_toks")
    )
    spans = toks.select(SF_.col("doc_id"), SF_.explode(_span_hashes(8)).alias("_h"))
    span_docs = spans.groupBy("_h").agg(SF_.count_distinct("doc_id").alias("_ndocs"))
    n_rows = span_docs.count()
    n_keys = span_docs.select("_h").distinct().count()
    assert n_rows == n_keys and n_rows > 0


def test_events_json_props_single_typed_parse(spark):
    """from_json appears ONCE (schema-on-read typed parse), and the
    aggregate shuffles only the small (name, bucket) grid."""
    from __spark_entry__ import q_events_json_props

    out = q_events_json_props(spark, SF)
    plan = _plan(out)
    assert plan.count("from_json") <= 2  # partial+final agg reprint, same expr
    assert "get_json_object" not in plan
    assert "hashpartitioning(name" in plan


def test_events_family_ms_clamp_pushed_to_scan(spark):
    """VERDICT r7 #7: the events-family analytics queries clamp time on
    the NATIVE ts column (mirror rule, `_events_ms_clamped`) so the
    ms-range predicate appears in PushedFilters for the CURRENT driver
    events encoding — a derived-ms clamp would silently full-scan after
    a fixture dtype churn."""
    import re

    import __spark_entry__ as E

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        # events_top_users_daily retired to pytest in r15 — resolved
        # through retired_queries() so its pushdown stays plan-audited
        for name in ("events_anomaly_hourly", "events_retention_cohorts",
                     "events_hll_daily", "events_seasonality",
                     "events_top_users_daily"):
            fn = E.queries().get(name) or E.retired_queries()[name]
            plan = _plan(fn(spark, SF))
            m = re.search(r"PushedFilters: \[[^\]]*\]", plan)
            assert m, f"{name}: no PushedFilters section"
            pushed = m.group(0)
            assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed, (
                f"{name}: ts clamp not pushed: {pushed}"
            )
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_adapter_scan_prunes_dt_partitions(spark, tmp_path):
    """A time-ranged select over the adapter's date-partitioned samples
    table must prune at the PARTITION level (dt bounds in the scan's
    PartitionFilters), not post-filter a full scan — the analog of the
    reference's PartsForRange partition walk (pkg/partmgr/partmgr.go)."""
    from v3io_tsdb_spark.adapter import TSDBAdapter
    from v3io_tsdb_spark.config import TSDBConfig

    T0 = 1704067200000
    DAY = 86_400_000
    a = TSDBAdapter(spark, str(tmp_path / "prune_db"), TSDBConfig())
    a.create()
    a.append([{"ts": T0 + d * DAY + i * 60_000, "name": "m", "labels": {},
               "value": 1.0} for d in range(3) for i in range(5)])
    import re

    res = a.select(from_time=T0 + DAY, to_time=T0 + DAY + 3_600_000)
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "dt" in m.group(0), plan[:800]
    assert res.count() == 5  # only day 1's in-range rows


def test_gap_report_single_scan_no_join(spark):
    """gap_report must stay one scan + one series shuffle (max-gap,
    envelope, and bucket presence from a single aggregate) — no
    self-join of the fact table."""
    from v3io_tsdb_spark.operators.gaps import gap_report

    df = spark.createDataFrame(
        [("m", "a", i * 1000) for i in range(10)],
        "name string, uid string, t long",
    )
    plan = gap_report(df, ts_col="t", step_ms=3_600_000)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:600]


def test_winnow_fingerprints_has_no_shuffle(spark):
    """Winnowing is scan-side array algebra: zero Exchange, no Python,
    whole-stage codegen throughout — the property that makes it free
    to co-locate with any other per-doc pass at 100 TB."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import winnow_fingerprints

    plan = _plan(winnow_fingerprints(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "*(" in plan


def test_group_diversity_never_joins_pairwise(spark):
    """The closed-form identity must keep the plan join-free: per-dim
    partial aggregates only — an O(n^2) pairwise join here would be
    the exact failure mode the operator exists to avoid."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import group_diversity

    plan = _plan(group_diversity(load_table(spark, SF, "embeddings"), "label"))
    assert "Join" not in plan, plan[:800]
    assert "CartesianProduct" not in plan
    # two hash aggregates: (label, dim) partials then per-label reduce
    assert plan.count("HashAggregate") >= 2


def test_bm25_broadcasts_small_sides(spark):
    """BM25's df table (|terms| rows) and corpus stats (1 row) must
    broadcast; a shuffle join against either would move the whole
    tf table for a constant-size dimension."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import bm25_topk

    plan = _plan(
        bm25_topk(load_table(spark, SF, "documents"), ("hash", "join", "vector"))
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_slice_kl_term_join_is_not_broadcast_dependent(spark):
    """The vocabulary join must not DEPEND on broadcasting: the term
    table is vocabulary-sized (unbounded at 100 TB). At fixture scale
    the planner may choose to broadcast it on size estimates — that's
    fine — but with auto-broadcast off the plan must degrade to a
    keyed shuffle join (never a nested loop), while the EXPLICIT
    broadcasts (per-slice totals, one-row grand total) survive because
    they are hinted, bounded sides."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import slice_kl_divergence

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = _plan(slice_kl_divergence(load_table(spark, SF, "documents")))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1200]
        # (the one-row grand-total crossJoin legitimately compiles to a
        # hinted BroadcastNestedLoopJoin — bounded side, same pattern
        # as tfidf's corpus-size join)
        assert "CartesianProduct" not in plan
        # the hinted bounded sides still broadcast
        assert "BroadcastExchange" in plan
    finally:
        (spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
         if old is not None
         else spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_conversion_latency_single_user_shuffle(spark):
    """One hash-partition on user for the as-of window, then a
    map-side-combinable bucket aggregate: no self-join of events."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.operators.funnel import conversion_latency

    import __spark_entry__ as E

    plan = _plan(E.queries()["events_conversion_latency"](spark, SF))
    assert "Join" not in plan, plan[:800]


def test_indexed_winnow_matches_never_touches_text(spark, tmp_path):
    """Served from the persisted winnow index, the match query must not
    re-tokenize or re-hash the corpus: no regex split, no md5, no scan
    of the documents table — only the index parquet (same discipline as
    the shingle-index sketches)."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import (
        read_winnow_index,
        winnow_matches,
        winnow_write_index,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "widx")
    winnow_write_index(docs, path, k=5, w=4)
    out = winnow_matches(docs, k=5, w=4, fps=read_winnow_index(spark, path))
    plan = _plan(out)
    assert "split(" not in plan and "md5(" not in plan
    assert "documents.parquet" not in plan
    # and the indexed path returns the same pairs as the direct path
    direct = {(r["id_a"], r["id_b"], r["n_shared"])
              for r in winnow_matches(docs, k=5, w=4).collect()}
    indexed = {(r["id_a"], r["id_b"], r["n_shared"]) for r in out.collect()}
    assert indexed == direct


def test_bm25_global_topk_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject
    (per-partition k-row heaps): with a common query term the matched
    set is corpus-sized, so an unpartitioned row_number window here
    would funnel every matched doc through one task (VERDICT r8 #3).
    The rank window is allowed only ABOVE the k-row limit, where its
    input is bounded at k rows by construction."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import bm25_topk

    plan = _plan(
        bm25_topk(load_table(spark, SF, "documents"), ("hash", "join", "vector"))
    )
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    # parents precede children in the plan string: the Window (rank
    # derivation) must sit above the TakeOrdered, never below it on
    # the unbounded scored set
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan[:1200]
    assert plan.count("Window") == 1


def test_group_diversity_norm_hoisted_out_of_lambda(spark):
    """The unit-normalize divide must reference a HOISTED norm column:
    Catalyst does not CSE inside higher-order-function lambdas, so an
    aggregate() embedded in the transform lambda re-runs the O(dim)
    norm once per element — O(dim^2)/row (VERDICT r8 #1). Assert no
    aggregate call is nested inside any lambdafunction in the plan."""
    import re

    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import group_diversity

    plan = _plan(group_diversity(load_table(spark, SF, "embeddings"), "label"))
    for m in re.finditer(r"lambdafunction\(", plan):
        # scan the balanced-paren extent of each lambda body
        depth, i = 1, m.end()
        while depth and i < len(plan):
            depth += {"(": 1, ")": -1}.get(plan[i], 0)
            i += 1
        assert "aggregate(" not in plan[m.end():i], plan[m.end():i][:400]


def test_zipf_vocabulary_is_never_globally_sorted(spark):
    """The top-N vocabulary cut must compile to TakeOrderedAndProject
    (per-partition heaps): at 100 TB the vocabulary is billions of
    terms, and a global Sort or an unpartitioned rank window over it
    is a single-task funnel. The ranking Window is allowed only ABOVE
    the TakeOrdered, where its input is top_n rows by construction."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import zipf_fit

    plan = _plan(zipf_fit(load_table(spark, SF, "documents")))
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan[:1200]
    assert plan.count("Window") == 1


def test_centroid_profile_never_shuffles_embeddings(spark):
    """Assignment is a broadcast nested-loop against the n_centroids-
    row anchor frame; the embedding table must reach the scored stage
    without a data-sized exchange. The anchor cut itself is TakeOrdered
    (never a global sort of the corpus), and the argmax window is
    partitioned per vector (n_centroids rows of state), never global."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import centroid_profile

    plan = _plan(centroid_profile(load_table(spark, SF, "embeddings")))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan
    assert "PartitionBy: [_id" in plan.replace("partitionBy", "PartitionBy").replace(
        "windowspecdefinition(_id", "PartitionBy: [_id"
    ), plan[:1500]


def test_mad_flags_stats_joins_are_broadcast(spark):
    """Both per-series stats frames (median, MAD) are series-count
    sized; they must come back as broadcast hash joins so the grid is
    never re-shuffled for the lookups — the only data-sized exchanges
    are the two per-series aggregations of the grid itself."""
    from v3io_tsdb_spark.operators.anomaly import robust_mad_flags
    from v3io_tsdb_spark.datasets import load_table

    ev = load_table(spark, SF, "events")
    from v3io_tsdb_spark.datasets import ts_millis

    grid = ev.groupBy(
        F.col("event_type").alias("name"),
        ts_millis("ts", dict(ev.dtypes)["ts"]).cast("long").alias("t"),
    ).agg(F.avg("value").alias("x"))
    plan = _plan(robust_mad_flags(grid, series_cols=("name",)))
    # 3 BHJ: the med lookup appears twice because the deviation frame
    # feeds both the MAD aggregate and the final projection (Spark
    # inlines the re-referenced subtree; ReuseExchange dedupes the
    # underlying grid exchange at runtime), plus the mad lookup
    assert plan.count("BroadcastHashJoin") == 3, plan[:1500]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_value_heatmap_is_single_partial_aggregable_shuffle(spark):
    """Both bucket edges are scan-side expressions: the whole heatmap
    must be one map-side-combinable aggregate — exactly one Exchange,
    with a partial HashAggregate below it."""
    from v3io_tsdb_spark.datasets import load_table, ts_millis
    from v3io_tsdb_spark.functions.histogram import value_heatmap

    ev = load_table(spark, SF, "events")
    ev = ev.withColumn("ts_ms", ts_millis("ts", dict(ev.dtypes)["ts"]).cast("long"))
    plan = _plan(value_heatmap(ev, "value", 20.0, group_cols=("event_type",)))
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "HashAggregate" in plan


def test_cooccur_pmi_doc_count_is_broadcast_and_pairs_key_on_doc(spark):
    """The 1-row corpus-size frame must broadcast (never a shuffle for
    a scalar), and the pair-generation self-join must key on the doc id
    — the df-capped inverted index contract: no pair generation outside
    a document's own kept terms."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import cooccur_pmi

    plan = _plan(cooccur_pmi(load_table(spark, SF, "documents")))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    # the only equality join condition on data-sized frames is id = id
    assert "id#" in plan


def test_pq_encode_is_zero_shuffle(spark):
    """PQ encode must be pure scan-side expression work: the naive
    formulation (explode ks*m candidate rows per vector + window
    argmin) would shuffle a 128x blow-up of the corpus; the literal-
    array argmin keeps the embedding table in its scan — no Exchange
    anywhere in the encode plan."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import pq_encode, pq_train

    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb, m=8, ks=16)
    plan = _plan(pq_encode(emb, cb))
    assert "Exchange" not in plan, plan[:1200]
    assert "Join" not in plan


def test_pq_topk_is_take_ordered(spark):
    """The ADC top-k must compile to TakeOrderedAndProject over the
    codes scan — per-partition heaps, never a global sort of the
    corpus-sized distance column (the X36 rule every top-k follows)."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import pq_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    plan = _plan(pq_topk(emb, q, k=20))
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert "Window" not in plan


def test_trailing_hampel_windows_only_the_bucketed_grid(spark):
    """Same contract as the z-score screen: the raw stream meets ONE
    partial-aggregable groupBy; the ordered window (and its bounded
    collect_list state) runs over the already-small series x buckets
    grid — exactly one window, exactly two exchanges (bucket agg +
    series re-key), never over raw events."""
    from v3io_tsdb_spark.datasets import load_table, ts_millis
    from v3io_tsdb_spark.operators.anomaly import trailing_hampel

    ev = load_table(spark, SF, "events")
    ev = ev.withColumn("ts_ms", ts_millis("ts", dict(ev.dtypes)["ts"]).cast("long"))
    plan = _plan(trailing_hampel(ev))
    assert plan.count("Window") == 1, plan[:1500]
    assert plan.count("Exchange") <= 2, plan[:1500]
    assert "partial_count" in plan  # map-side combine before any window


def test_pq_rerank_broadcasts_the_shortlist(spark):
    """The rerank pass must touch the raw table ONLY through a
    broadcast of the R-row ADC shortlist (two TakeOrdered cuts, no
    shuffle of the corpus, no sort-merge join)."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.similarity import pq_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    plan = _plan(pq_topk(emb, q, k=20, rerank=200))
    assert plan.count("TakeOrderedAndProject") == 2, plan[:1500]
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_cms_sketch_is_one_partial_aggregable_shuffle(spark):
    """The d bucket ids are scan-side expressions and the sketch is ONE
    map-side-combinable aggregate: at 100 TB each executor emits at
    most d*w partial cells. Exactly one Exchange; no join, no window."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.sketches import cms_sketch

    plan = _plan(cms_sketch(load_table(spark, SF, "events"), "user_id"))
    assert plan.count("Exchange") == 1, plan[:1200]
    assert "Join" not in plan and "Window" not in plan
    assert "partial_count" in plan


def test_heavy_hitters_exact_side_is_take_ordered(spark):
    """The exact top-k must compile to TakeOrderedAndProject (never a
    global sort of the per-key counts), and the sketch + totals come
    back as broadcasts — no sort-merge join anywhere."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.sketches import heavy_hitters_gate

    plan = _plan(heavy_hitters_gate(load_table(spark, SF, "events"), "user_id"))
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_theilsen_all_pairs_never_reach_a_shuffle(spark):
    """The O(m²) pair set is scan-side array algebra over the collected
    grid: no join, no window, no explode-then-shuffle — the only
    exchanges are the grid build and the series-keyed collect."""
    from v3io_tsdb_spark.operators.trend import theilsen_trend

    rows = [("m", "u%d" % (i % 4), i * 86_400_000, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    plan = _plan(theilsen_trend(df))
    assert "Join" not in plan and "Window" not in plan, plan[:1200]
    assert plan.count("Exchange") <= 1  # series-keyed collect only


def test_seasonal_naive_single_sort_two_frames(spark):
    """Both lookups (t−season, t−step) ride ONE series-keyed window
    sort — no self-join, no grid densification — and the per-series
    aggregate reuses the window's partitioning (no extra exchange)."""
    from v3io_tsdb_spark.operators.trend import seasonal_naive_eval

    rows = [("m", "u", i * 86_400_000, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    plan = _plan(seasonal_naive_eval(df))
    assert "Join" not in plan, plan[:1200]
    assert plan.count("Window") == 1
    assert plan.count("Sort") == 1


def test_assoc_rules_no_event_self_join(spark):
    """Pair generation must be scan-side from each basket's array: the
    raw table is aggregated once and never self-joined; item supports
    and the basket total come back only as broadcasts."""
    from v3io_tsdb_spark.operators.assoc import basket_assoc_rules

    rows = [("b%d" % (i % 50), "i%d" % (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "bid string, item string")
    plan = _plan(basket_assoc_rules(df, ("bid",), "item"))
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_bigram_logprob_vocab_joins_stay_keyed(spark):
    """Same contract as unigram_logprob: neither the bigram vocabulary
    nor the context table is assumed broadcastable (they scale with
    the corpus) — the model joins are key-partitioned, never nested
    loops, and only the 1-row V total broadcasts."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.text import bigram_logprob

    plan = _plan(bigram_logprob(load_table(spark, SF, "documents")))
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row V total only


def test_classifier_model_is_broadcast_and_one_shuffle(spark):
    """Inference plumbing: features hash scan-side, the (bucket,
    weight) model joins as a broadcast hash join, and the only shuffle
    is the doc-keyed mean — the plan a trained model inherits."""
    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.classifier import classifier_score

    plan = _plan(classifier_score(load_table(spark, SF, "documents")))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1


def test_ols_trend_is_one_aggregate(spark):
    """Five moments in ONE partial-aggregable series-keyed pass: no
    window, no join, no second exchange after the grid."""
    from v3io_tsdb_spark.operators.trend import ols_trend

    rows = [("m", "u%d" % (i % 4), i * 86_400_000, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "name string, uid string, t long, x double")
    plan = _plan(ols_trend(df))
    assert "Join" not in plan and "Window" not in plan, plan[:1200]
    assert plan.count("Exchange") == 1
    assert "partial" in plan  # map-side combine of the moments


def test_xcorr_alignment_is_equi_join(spark):
    """Lag expansion is a Generate (array explode), never a cartesian
    product; the A/B alignment is an equi-join on the shifted bucket
    key."""
    from v3io_tsdb_spark.operators.trend import xcorr_lagged

    rows = [(n, i * 86_400_000, float(i)) for n in ("A", "B") for i in range(20)]
    df = spark.createDataFrame(rows, "name string, t long, x double")
    plan = _plan(xcorr_lagged(df, "A", "B"))
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_histogram_quantile_runs_on_panel_sized_data(spark):
    """The quantile reconstruction is downstream of the histogram's one
    raw-data shuffle: one more exchange for the (group) window, the
    quantile list joined as a broadcast, no sort-merge join anywhere."""
    from v3io_tsdb_spark.datasets import ts_millis
    from v3io_tsdb_spark.functions.histogram import (
        histogram_quantile,
        value_heatmap,
    )
    from v3io_tsdb_spark.datasets import load_table

    ev = load_table(spark, SF, "events")
    ev = ev.withColumn("ts_ms", ts_millis("ts", dict(ev.dtypes)["ts"]).cast("long"))
    hm = value_heatmap(ev, "value", 20.0, group_cols=("event_type",))
    plan = _plan(histogram_quantile(hm, (0.5, 0.9), group_cols=("event_type", "t"), width=20.0))
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 2
    assert "Window" in plan


def test_rrf_fusion_consumes_reduced_lists(spark):
    """Every ranker reduces to its own top-k' before fusion touches it:
    three TakeOrdered in the plan (bm25, cosine, fused), and fusion
    adds no data-sized structure."""
    from pyspark.sql import Window

    from v3io_tsdb_spark.datasets import load_table
    from v3io_tsdb_spark.functions.fusion import rrf_fuse
    from v3io_tsdb_spark.functions.similarity import cosine_topk
    from v3io_tsdb_spark.functions.text import bm25_topk

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    bm = bm25_topk(docs, ("hash", "join"), k=50).select(
        F.col("doc_id").alias("id"), "rank"
    )
    w = Window.orderBy(F.desc("cosine"), F.col("vec_id"))
    import pyspark.sql.functions as SF2
    cos = (
        cosine_topk(emb, qvec, k=50)
        .withColumn("rank", SF2.row_number().over(w))
        .select(F.col("vec_id").alias("id"), "rank")
    )
    plan = _plan(rrf_fuse([bm, cos], "id", k=20))
    assert plan.count("TakeOrderedAndProject") == 3, plan[:1500]
    assert "CartesianProduct" not in plan


def test_bloom_filter_sits_below_the_join_exchange(spark):
    """The whole point of the explicit bloom: the membership Filter
    (the getbit/md5 expression) must run on the probe side BEFORE the
    semi-join, so only survivors reach the join — pinned by forcing a
    shuffle join (the at-scale shape where the build side can't
    broadcast as rows) and asserting the filter lives in the probe
    subtree under the join."""
    from v3io_tsdb_spark.functions.bloom import (
        bloom_might_contain,
        build_bloom_bitmap,
    )

    small = spark.createDataFrame(
        [("u%d" % i,) for i in range(50)], "user_id string"
    )
    big = spark.createDataFrame(
        [("u%d" % (i % 200), i) for i in range(2000)], "user_id string, v long"
    )
    bm = build_bloom_bitmap(small, "user_id")
    pruned = big.where(bloom_might_contain(F.col("user_id"), bm))
    joined = pruned.hint("merge").join(
        small.distinct(), "user_id", "left_semi"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan and "LeftSemi" in plan, plan[:1500]
    assert "getbit" in plan
    # the filter must appear in the plan BELOW (after, in toString
    # order) the join node — i.e., inside a child subtree, not above it
    assert plan.index("getbit") > plan.index("SortMergeJoin"), plan[:1500]
