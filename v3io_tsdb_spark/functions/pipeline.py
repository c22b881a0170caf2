"""End-to-end training-corpus preparation pipeline.

Composes the individual operators (text quality stats → exact dedup →
benchmark decontamination → deterministic split) into the single chain
a production data pipeline runs before tokenization. Each stage is the
already-tested primitive; this module only sequences them, keeping the
cheap row-count reducers (quality filter, dedup) ahead of the
expensive shingle explosion (decontamination). The surviving-docs
boundary is materialized once by default (localCheckpoint) because two
downstream consumers read it; pass ``materialize_kept=False`` for the
fully-declarative single plan (the checkpoint halves the work, the
declarative form is the better shape when the pipeline is itself a
subquery of a larger plan).

100 TB shape: quality filter is a scan-side predicate; exact dedup is
one groupBy(fingerprint) keeping min id (map-side combinable);
decontamination broadcasts the benchmark-sized eval shingles so the
corpus never shuffles for it; the split column is a pure hash
expression. Total: two shuffles (dedup groupBy, contaminated-id
anti-join) over rows that survive the earlier stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import decontaminate
from .sampling import assign_split
from .text import text_stats


def corpus_pipeline(
    docs: DataFrame,
    eval_df: DataFrame,
    quality_min: float = 0.6,
    ngram_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_kept: bool = True,
) -> DataFrame:
    """The cleaned, split-assigned corpus: one row per surviving doc
    with its stats columns plus ``split``.

    Stages (in the order a real pipeline runs them — cheapest filter
    first, priciest screen last):

    1. quality gate: ``text_stats`` heuristics, keep ``quality >=
       quality_min`` (default 2 of 3 checks);
    2. exact dedup: keep the smallest ``id_col`` per normalized-text
       fingerprint;
    3. decontamination: drop docs sharing any word ``ngram_n``-gram
       with ``eval_df`` (the benchmark set is used as given — no
       quality gate on it);
    4. deterministic split assignment (md5-bucket train/val/test).
    """
    stats = text_stats(docs, text_col=text_col, id_col=id_col)
    enriched = docs.select(id_col, text_col).join(stats, id_col)
    q = enriched.where(F.col("quality") >= quality_min)

    keepers = q.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = q.join(keepers.select(id_col), id_col, "left_semi")
    if materialize_kept:
        # `kept` feeds BOTH the decontamination shingle explosion and
        # the final anti-join; without a materialized boundary Spark
        # re-runs the whole stats+dedup subtree (and doubles the
        # generated-code surface) for each consumer. This is the
        # standard pipeline-stage checkpoint a production runner does
        # between screening passes.
        kept = kept.localCheckpoint(eager=True)

    bad = decontaminate(kept, eval_df, text_col=text_col, id_col=id_col, n=ngram_n)
    clean = kept.join(bad.select(id_col), id_col, "left_anti")

    return assign_split(clean, id_col).drop(text_col)
