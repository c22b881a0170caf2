"""Two-pass distributed prefix sum (functions/prefixsum.py): exact
equivalence to the naive single-window form, plus the plan property
that justifies it — the heavy ordered window is sharded by the range
partition id, so no task ever sorts a whole group (SCALE.md)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from v3io_tsdb_spark.functions.packing import pack_sequences
from v3io_tsdb_spark.functions.prefixsum import ordered_prefix_sum
from v3io_tsdb_spark.functions.sampling import select_within_token_budget


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fixture(spark, rows=2000, groups=3):
    return spark.range(rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % groups).cast("string").alias("lang"),
        (F.pmod(F.xxhash64("id"), F.lit(97)) + 1).alias("n_tokens"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) / 1000.0).alias("quality"),
    )


@pytest.mark.parametrize("num_shards", [1, 4, 17])
def test_matches_single_window(spark, num_shards):
    """Byte-identical to the naive whole-group window at any shard
    count — offsets + local sums telescope regardless of where the
    range boundaries fall."""
    df = _fixture(spark)
    got = ordered_prefix_sum(
        df, "n_tokens", [("doc_id", False)], ("lang",), "cum",
        num_shards=num_shards,
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_matches_single_window_desc_order(spark):
    """Descending + tiebreaker order (the budget-selection shape)."""
    df = _fixture(spark)
    got = ordered_prefix_sum(
        df, "n_tokens", [("quality", True), ("doc_id", False)], ("lang",), "cum",
        num_shards=8,
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_single_giant_group_spreads_across_shards(spark):
    """The 100 TB property, exercised: ONE group, many rows — the rows
    of the heavy window's input must be spread over multiple (shard,
    group) partitions, i.e. the whole group never lands on one task."""
    df = _fixture(spark, rows=5000, groups=1)
    out = ordered_prefix_sum(
        df, "n_tokens", [("doc_id", False)], ("lang",), "cum", num_shards=8
    )
    # group the FINISHED rows by the task that produced them: the local
    # window runs per (shard, group), so its output partition sizes are
    # exactly the per-task sort sizes
    sizes = (
        out.withColumn("tid", F.spark_partition_id())
        .groupBy("tid").count().select("count").collect()
    )
    biggest = max(r["count"] for r in sizes)
    assert len(sizes) > 1, "whole group collapsed onto one task"
    assert biggest < 5000, f"one task sorted the entire group ({biggest} rows)"
    # and the result is still the exact global prefix sum
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
    assert out.exceptAll(want).count() == 0


def _heavy_windows_are_shard_local(plan: str, order_token: str) -> bool:
    """Every window spec that sorts by the data order key must be
    partitioned by the shard id (_ps_pid); only the tiny subtotal
    window (input: one row per shard x group) may span a whole group."""
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    heavy = [s for s in specs if order_token in s]
    return bool(heavy) and all("_ps_pid" in s for s in heavy)


def test_pack_sequences_plan_has_no_whole_group_sort(spark):
    """pack_sequences' plan at forced fan-out: the window ordering by
    doc_id partitions by the shard id — a Window partitioned by
    (split, lang) alone sorting doc_id would be the one-task-per-group
    shape. (The auto path size-gates; forcing num_shards pins the
    at-scale plan on the small fixture.)"""
    docs = _fixture(spark).withColumn("split", F.lit("train"))
    out = pack_sequences(docs, budget=2048, num_shards=8)
    plan = _plan(out)
    assert _heavy_windows_are_shard_local(plan, "doc_id"), plan[:3000]


def test_budget_selection_plan_has_no_whole_group_sort(spark):
    """select_within_token_budget: same property for the quality-DESC
    running sum (the order with no natural shard key)."""
    out = select_within_token_budget(_fixture(spark), budget=3000, num_shards=8)
    plan = _plan(out)
    assert _heavy_windows_are_shard_local(plan, "quality"), plan[:3000]


def test_auto_gate_bypasses_sharding_for_small_groups(spark):
    """Size gate (VERDICT r6 #1): with no forced num_shards and every
    group far below target_rows_per_shard, the plan must be the plain
    single-window form — no shard column, no broadcast join, no extra
    quantile pass — and still exact."""
    df = _fixture(spark)
    got = ordered_prefix_sum(df, "n_tokens", [("doc_id", False)], ("lang",), "cum")
    plan = _plan(got)
    assert "_ps_pid" not in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_auto_gate_shards_when_groups_exceed_target(spark):
    """And the converse: drop the target below the group size and the
    auto path must fan out (shard column present) while staying exact."""
    df = _fixture(spark, rows=3000, groups=1)
    got = ordered_prefix_sum(
        df, "n_tokens", [("doc_id", False)], ("lang",), "cum",
        target_rows_per_shard=500,
    )
    plan = _plan(got)
    assert "_ps_pid" in plan, plan[:3000]
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stable_across_evaluations(spark):
    """Shard assignment must be a pure function of the data: the
    rejected repartitionByRange+spark_partition_id design re-sampled
    range boundaries per evaluation, so the subtotal and data branches
    of the self-join could disagree. Quantile-bounded shards cannot."""
    df = _fixture(spark)
    got = ordered_prefix_sum(
        df, "n_tokens", [("doc_id", False)], ("lang",), "cum", num_shards=8
    )
    runs = [sorted(map(tuple, got.collect())) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]


def test_pack_sequences_semantics_unchanged(spark):
    """pack_id/pack_offset still match the direct concat-chunk
    simulation (the property test's contract)."""
    docs = _fixture(spark, rows=300, groups=2).withColumn("split", F.lit("train"))
    out = pack_sequences(docs, budget=256).orderBy("lang", "doc_id").collect()
    by_group: dict = {}
    for r in sorted(out, key=lambda r: (r["lang"], r["doc_id"])):
        start = by_group.get(r["lang"], 0)
        assert r["pack_id"] == start // 256, r
        assert r["pack_offset"] == start % 256, r
        by_group[r["lang"]] = start + r["n_tokens"]
