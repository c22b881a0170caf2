"""ANALYZE-style table profiling: per-column stats in one pass.

The warehouse `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
panel (Spark's own stats collector exposes the same facts through the
catalog; this operator returns them as a queryable DataFrame): for
every column its row/null/distinct counts plus type-split min/max —
numeric extremes and mean as doubles, string extremes as strings — so
a pipeline can gate on completeness ("null_frac jumped"), cardinality
("an enum column grew a 7th value"), or range drift before training
ever sees the data. The reference exposes table introspection as the
`check`/`info` CLI inspectors (pkg/tsdbctl/check.go, info.go); this is
the column-level generalization of those.

Two distinct-count strategies, same output contract:

- ``approx=False`` (default; the oracle-gated path): exact
  ``count(DISTINCT col)`` per column. Spark plans multiple distinct
  aggregates via an Expand node that replicates every input row once
  per distinct group — an O(n_cols)× data blowup that is FINE at
  audit scale but is the wrong default for a 100 TB sweep.
- ``approx=True`` (the at-scale path): HyperLogLog++
  ``approx_count_distinct`` — a single mergeable pass, NO Expand in
  the plan (plan-asserted in tests), ~2% relative error.

Everything else (count, nulls, min, max, mean) is partial-aggregable
in both modes; output is exactly one row per profiled column, built
by exploding a one-row wide aggregate — nothing data-sized ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

_NUMERIC = NumericType


def table_profile(
    df: DataFrame,
    columns: list | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per column: ``column, n_rows, n_null, n_distinct,
    min_num, max_num, mean`` (numeric columns; null otherwise) and
    ``min_str, max_str`` (string columns; null otherwise)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else [f.name for f in df.schema.fields]
    for c in cols:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")

    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs, structs = [], []
    for c in cols:
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, StringType)
        aggs += [
            F.count(F.lit(1)).alias(f"_rows_{c}"),
            F.count(F.col(c)).alias(f"_nn_{c}"),
            distinct(c).alias(f"_nd_{c}"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias(f"_minn_{c}"),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias(f"_maxn_{c}"),
            (F.avg(c) if is_num else F.lit(None).cast("double")).alias(f"_mean_{c}"),
            (F.min(c) if is_str else F.lit(None).cast("string")).alias(f"_mins_{c}"),
            (F.max(c) if is_str else F.lit(None).cast("string")).alias(f"_maxs_{c}"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_rows_{c}").alias("n_rows"),
                (F.col(f"_rows_{c}") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_minn_{c}").alias("min_num"),
                F.col(f"_maxn_{c}").alias("max_num"),
                F.col(f"_mean_{c}").alias("mean"),
                F.col(f"_mins_{c}").alias("min_str"),
                F.col(f"_maxs_{c}").alias("max_str"),
            )
        )
    wide = df.agg(*aggs)
    return (
        wide.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str | None = None,
) -> DataFrame:
    """Foreign-key orphan check — the referential-integrity leg of the
    pipeline-QA panel (`table_profile` covers per-column facts; this
    covers cross-table ones): one row per relation with the child row
    count, how many child rows reference a parent key that does not
    exist, and how many distinct such keys there are. Null child keys
    are counted separately (``n_null_keys``) and are NOT orphans — an
    optional FK is absent, not dangling, matching SQL FK semantics
    where NULL never violates the constraint.

    Plan: the parent reduces to its distinct key set FIRST (partial-
    aggregable; bounded by parent cardinality, not row count), then
    one LEFT ANTI join from the non-null child keys — Spark broadcasts
    the key set when small (dimension tables; plan-asserted) and
    shuffles on the key otherwise, and AQE's skew split applies since
    anti joins carry no build-side-duplication hazard here (the key
    set is distinct by construction, the X39 dup-span rule). Nothing
    data-sized reaches the driver.
    """
    rel = relation or f"{child_key}->{parent_key}"
    keys = parent.select(F.col(parent_key).alias("_pk")).where(
        F.col("_pk").isNotNull()
    ).distinct()
    ck = child.select(F.col(child_key).alias("_ck"))
    nn = ck.where(F.col("_ck").isNotNull())
    orphans = nn.join(keys, nn["_ck"] == keys["_pk"], "left_anti")
    totals = ck.agg(
        F.count(F.lit(1)).alias("n_child_rows"),
        F.sum(F.col("_ck").isNull().cast("long")).alias("n_null_keys"),
    )
    o = orphans.agg(
        F.count(F.lit(1)).alias("n_orphan_rows"),
        F.count_distinct(F.col("_ck")).alias("n_orphan_keys"),
    )
    return totals.crossJoin(o).select(
        F.lit(rel).alias("relation"),
        "n_child_rows",
        "n_null_keys",
        "n_orphan_rows",
        F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
    )


def referential_report(relations: list) -> DataFrame:
    """Union of ``referential_orphans`` rows for ``relations`` =
    [(child, parent, child_key, parent_key), ...] — the whole
    schema's FK health in one panel (|relations| rows)."""
    out = None
    for child, parent, ck, pk in relations:
        row = referential_orphans(child, parent, ck, pk)
        out = row if out is None else out.unionByName(row)
    return out
