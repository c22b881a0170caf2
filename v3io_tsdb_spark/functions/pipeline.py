"""End-to-end training-corpus preparation pipeline.

Composes the individual operators (text quality stats → exact dedup →
benchmark decontamination → deterministic split) into the single chain
a production data pipeline runs before tokenization. Each stage is the
already-tested primitive; this module only sequences them, keeping the
cheap row-count reducers (quality filter, dedup) ahead of the
expensive shingle explosion (decontamination). The surviving-docs
boundary stays DECLARATIVE by default: although two downstream
consumers read it, Catalyst's ReuseExchange dedupes the shared
dedup-shuffle subtree, so the single plan measures faster than an
eager ``localCheckpoint`` at sf0.1 (2.68s vs 2.88s cold, 2.30s vs
2.72s warm — r8 stage profile) AND avoids materializing the whole
surviving corpus at 100 TB. Pass ``materialize_kept=True`` to restore
the checkpoint when the pipeline result feeds MANY more than two
consumers or an iterative caller.

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
from .share import shared
from .text import text_stats


def corpus_pipeline(
    docs: DataFrame,
    eval_df: DataFrame,
    quality_min: float = 0.6,
    ngram_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_kept: bool = False,
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
    # the stats table is METADATA-scale (id + stat columns, no text)
    # and feeds four consumers through q/kept (keepers, the semi-join,
    # decontaminate's input, the anti-join) — shared() tokenizes the
    # corpus once instead of once per consumer (r16; the text-bearing
    # frames stay declarative: materializing them would copy the
    # corpus, the share.py "do not wrap raw scans" rule)
    stats = shared(text_stats(docs, text_col=text_col, id_col=id_col))
    enriched = docs.select(id_col, text_col).join(stats, id_col)
    q = enriched.where(F.col("quality") >= quality_min)

    keepers = q.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = q.join(keepers.select(id_col), id_col, "left_semi")
    if materialize_kept:
        # opt-in stage boundary: cuts the plan so the stats+dedup
        # subtree is computed exactly once regardless of how many
        # consumers the caller adds downstream (in the default two-
        # consumer shape ReuseExchange already covers it — measured
        # faster without the checkpoint, see module docstring)
        kept = kept.localCheckpoint(eager=True)

    bad = decontaminate(kept, eval_df, text_col=text_col, id_col=id_col, n=ngram_n)
    clean = kept.join(bad.select(id_col), id_col, "left_anti")

    return assign_split(clean, id_col).drop(text_col)


def corpus_pipeline_stages(
    docs: DataFrame,
    eval_df: DataFrame,
    quality_min: float = 0.6,
    ngram_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Cumulative stage-prefix plans of :func:`corpus_pipeline`, for
    regression triage (VERDICT r7 #3): each entry is the declarative
    pipeline truncated after that stage, so timing them attributes cost
    per stage (stage_k cost ≈ time[k] - time[k-1], modulo shared
    codegen). Keys in execution order: ``stats``, ``dedup``,
    ``decontaminate``, ``split`` (== the full pipeline)."""
    stats = shared(text_stats(docs, text_col=text_col, id_col=id_col))
    enriched = docs.select(id_col, text_col).join(stats, id_col)
    q = enriched.where(F.col("quality") >= quality_min)
    keepers = q.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = q.join(keepers.select(id_col), id_col, "left_semi")
    bad = decontaminate(kept, eval_df, text_col=text_col, id_col=id_col, n=ngram_n)
    clean = kept.join(bad.select(id_col), id_col, "left_anti")
    return {
        "stats": q,
        "dedup": kept,
        "decontaminate": clean,
        "split": assign_split(clean, id_col).drop(text_col),
    }
