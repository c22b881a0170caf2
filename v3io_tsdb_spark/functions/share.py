"""Explicit sharing of multiply-referenced plan subtrees.

Spark SQL plans are trees, not DAGs: a DataFrame that feeds N
downstream consumers is re-analyzed, re-optimized and RE-EXECUTED N
times. Catalyst's ReuseExchange can dedup identical exchange subtrees,
but per-consumer column pruning specializes each copy (different
Project lists under the exchange), so in practice none of them match:
measured on this repo's LM-scoring family, `doc_perplexity_buckets`
executed 12 parquet scans and 10 explodes of the same corpus in one
query, with zero ReusedExchange nodes in the final adaptive plan
(optimization guide §2.4/§3.3).

`shared()` materializes such an intermediate exactly once via a LAZY
localCheckpoint: the subtree is planned once, computed once at first
use (blocks persisted memory-then-disk on the executors that computed
them — no extra shuffle), and every downstream reference reads the
same blocks. Lineage is truncated, so plan-compile cost stops growing
with the number of references (guide §3.3: "materialising an
intermediate truncates the plan"; §5: localCheckpoint as the cheap
lineage cut).

Use it on intermediates that are (a) referenced by 2+ consumers and
(b) bounded well below the raw input — vocabulary/panel-sized
aggregates, df-capped postings, per-doc stat rows. Do NOT wrap raw
scans: the blocks live in executor memory/disk, and at 100 TB a
materialized copy of the input is a full extra write; a pruned
re-scan is cheaper there.

eager=False, deliberately: an eager checkpoint runs a separate Spark
job inside the DataFrame BUILDER (serial driver-side latency per
call — guide §5 "the driver should do almost no data work"), while
the lazy form folds materialization into the query's own first job.
Blocks are released by the ContextCleaner once the plan references
are dropped.

This is per-invocation sharing WITHIN one query's execution — every
bench/oracle invocation still computes from the parquet inputs; no
state survives the DataFrame's lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shared(df: DataFrame) -> DataFrame:
    """Materialize a multiply-referenced intermediate once (lazy
    localCheckpoint); see module docstring for when and why."""
    return df.localCheckpoint(eager=False)
