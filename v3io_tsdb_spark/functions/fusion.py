"""Rank fusion for hybrid retrieval.

A training-data curation pass rarely trusts one ranker: lexical
retrieval (BM25, functions/text.py) finds exact-term evidence,
embedding retrieval (cosine top-k, functions/similarity.py) finds
paraphrase — mining a topical slice wants both. Reciprocal-rank
fusion (Cormack, Clarke & Buettcher, SIGIR '09) is the standard
score-free combiner: ``rrf(d) = Σ_systems 1/(c + rank_system(d))``,
robust to the systems' incomparable score scales because it consumes
only ranks.

Scale shape: fusion consumes ALREADY-REDUCED top-k′ lists (each
ranker did its own TakeOrdered), so however large the corpus, the
fusion input is Σk′ rows — union, one id-keyed aggregate over a
bounded set, TakeOrdered. The heavy lifting stays inside the
upstream rankers, which are individually plan-audited.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list,
    id_col: str = "id",
    names: tuple = None,
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Fuse ranked lists (each a DataFrame with ``id_col`` and a
    1-based ``rank`` column) into a top-``k`` by reciprocal-rank
    score. Output: fused ``rank``, the id, ``rrf``, and each system's
    contributing rank (``rank_<name>``, NULL where the system didn't
    retrieve the id — RRF's standard treatment: absent lists simply
    contribute nothing).

    Determinism: rrf is a sum of at most ``len(rankings)`` exact
    reciprocals rounded at 6 dp before ordering; ties break on id —
    the same rounded-score-then-id rule as bm25_topk/cosine_topk.
    """
    names = tuple(names) if names else tuple(
        "sys%d" % i for i in range(len(rankings))
    )
    parts = [
        r.select(
            F.col(id_col),
            F.col("rank").cast("long").alias("rank"),
            F.lit(i).alias("_sys"),
        )
        for i, r in enumerate(rankings)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    eps = 1e-9
    sys_ranks = [
        F.min(F.when(F.col("_sys") == i, F.col("rank"))).alias(
            "rank_%s" % names[i]
        )
        for i in range(len(rankings))
    ]
    g = u.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))) + F.lit(eps),
            6,
        ).alias("rrf"),
        *sys_ranks,
    )
    topk = g.orderBy(F.desc("rrf"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf"), F.col(id_col))
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", id_col, "rrf", *["rank_%s" % n for n in names])
