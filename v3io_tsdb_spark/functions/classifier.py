"""Feature-hashed linear classifier inference — the fastText-shaped
quality-filter serving path (Joulin et al. '16; CCNet / GPT-3-style
corpora apply exactly this model family to keep/drop documents).

The MODEL is a (bucket → weight) table: hashed bigram features, a
linear layer, a sigmoid. Training happens offline elsewhere; what the
engine owns at 100 TB is the INFERENCE plumbing — features hashed
scan-side (no vocabulary lookup, the whole point of the hashing
trick), the weight table broadcast (n_buckets rows, never
data-sized), one doc-keyed aggregate. No Python in the hot path:
hashing is ``md5`` column algebra and the "model" is a broadcast hash
join + mean + sigmoid, all whole-stage-codegen.

:func:`default_weight_table` is a deterministic stand-in (fixed
integer mix of the bucket id) so the full serving path is
oracle-checkable hash-level; a trained model drops into the same
(bucket, weight) contract without touching the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions.dedup import md5_int60
from v3io_tsdb_spark.functions.text import tokens_col


def default_weight_table(spark: SparkSession, n_buckets: int = 4096) -> DataFrame:
    """Deterministic stand-in weights in [-1, 1):
    ``w(b) = ((b · 2654435761) mod 1999) / 999.5 − 1``
    (Knuth's multiplicative constant scatters the buckets; 1999 prime
    keeps the residue sequence full-period). Pure integer arithmetic
    before one exact division, so any SQL engine regenerates the table
    bit-for-bit."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(1999)) / F.lit(999.5)
            - F.lit(1.0)
        ).alias("weight"),
    )


def hashed_bigram_buckets(text: Column, n_buckets: int = 4096) -> Column:
    """Each adjacent token pair hashed to a feature bucket
    (``md5_int60(w1 ‖ ' ' ‖ w2) mod n_buckets`` — bit-identical in SQL
    via the md5-substring cast, see dedup.md5_int60). Texts with fewer
    than 2 tokens have no features."""
    toks = tokens_col(F.lower(F.trim(text)))
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.pmod(
            md5_int60(F.concat(a, F.lit(" "), b)), F.lit(n_buckets)
        ),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<bigint>")
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-doc linear-classifier score: mean weight of the doc's hashed
    bigram features through a sigmoid — fastText's scoring rule with
    the embedding dimension collapsed to 1 (a pure linear model), which
    is exactly the shape the big corpus-quality filters serve.

    Plan: scan-side feature hashing → explode → broadcast hash join
    with the (bucket, weight) model → one doc-keyed partial-aggregable
    mean → sigmoid. The only shuffle is the doc-keyed aggregate; model
    size is the broadcast bound, independent of corpus size.

    Determinism boundary: the mean margin is rounded at 6 dp before
    the sigmoid (same rule as the logprob scorers), so both engines
    exponentiate bit-identical doubles.
    """
    w = weights if weights is not None else default_weight_table(
        df.sparkSession, n_buckets
    )
    feats = df.select(
        F.col(id_col),
        F.explode(hashed_bigram_buckets(F.col(text_col), n_buckets)).alias(
            "bucket"
        ),
    )
    eps = 1e-9
    scored = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.round(F.avg("weight") + F.lit(eps), 6).alias("margin"),
        )
    )
    from v3io_tsdb_spark.functions.detmath import with_det_exp

    # det_exp (detmath: shared IEEE-only exp) so the sigmoid is
    # bit-identical to the oracle engine's on any libm
    scored = with_det_exp(scored, "_enm", -F.col("margin"))
    return scored.select(
        id_col,
        "n_features",
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.col("_enm"))).alias("score"),
    )
