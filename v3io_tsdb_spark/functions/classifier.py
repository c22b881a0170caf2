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
    scored = _classifier_margin(df, weights, text_col, id_col, n_buckets)
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


def _classifier_margin(
    df: DataFrame,
    weights: DataFrame | None,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """The pre-sigmoid classifier aggregate ``(id, n_features, margin)``
    — the shared head of :func:`classifier_score` and
    :func:`calibration_buckets` (which applies its own temperature to
    the margin and never consumes the untempered sigmoid, so building
    the score ladder there was a dead ~150 ms analysis pass)."""
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
    return (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.round(F.avg("weight") + F.lit(eps), 6).alias("margin"),
        )
    )


def calibration_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 10,
    inv_temperature: int = 32,
) -> DataFrame:
    """Reliability table for the serving classifier (the ECE /
    reliability-diagram shape, Guo et al. '17): scores bucketed into
    ``n_bins`` deciles against the rule-based reference labels
    (text.quality_rules' ``keep``), per bucket the doc count, positive
    count, mean score and observed positive rate — the eval step every
    classifier-filtered corpus needs BEFORE the score threshold is
    trusted to drop data (a filter calibrated at 0.9 that only keeps
    62% true positives is a different corpus than its config claims).

    The table is built at a sharpened temperature — Guo et al.'s own
    calibration knob — because the stand-in weight table's mean-margin
    scores concentrate near 0.5 (avg of ~uniform weights over n
    features has σ ≈ 0.58/√n): ``score_T = σ(margin / T)`` with
    ``1/T = inv_temperature`` an exact integer, so the scaling is one
    exact IEEE multiply on the 6dp-rounded margin and the deciles
    actually populate. T is the free parameter a real calibration fit
    would tune; the table is its objective function materialized.

    Exact-integer contract (the r14-r16 family rule): the sigmoid
    score — bit-identical cross-engine via the 6dp-rounded margin +
    det_exp — is quantized to micro-units FIRST (quantize_half_away),
    the decile is integer division on the quantized value (never
    floor on a raw double at a bucket boundary), and every emitted
    column is BIGINT: mean score by half_away_div of the exact micro
    sum, positive rate by q6_ratio, and ``gap_micro = |mean − rate|``
    is the per-bucket ECE term.

    Plan at 100 TB: the classifier side is its own doc-keyed
    aggregate; the rules side is a zero-shuffle per-doc projection;
    their join keys both on ``doc_id`` so ONE exchange aligns them;
    the final bucket aggregate is partial-aggregable on ≤ n_bins keys.
    """
    from v3io_tsdb_spark.functions.detmath import (
        half_away_div_col,
        q6_ratio_col,
        with_det_exp,
    )
    from v3io_tsdb_spark.functions.text import quality_rules, quantize_half_away

    # tempered sigmoid straight off the margin aggregate: the untempered
    # ``score`` ladder of classifier_score was never consumed here (its
    # column pruned out), so skipping its emission drops a dead
    # analysis pass while leaving every output value untouched
    scored = _classifier_margin(df, None, text_col, id_col, 4096)
    scored = with_det_exp(
        scored, "_enmt", -(F.col("margin") * F.lit(int(inv_temperature)))
    )
    scored = scored.select(
        F.col(id_col),
        (F.lit(1.0) / (F.lit(1.0) + F.col("_enmt"))).alias("_score_t"),
    )
    labels = quality_rules(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("keep").cast("long").alias("_y")
    )
    j = scored.join(labels, id_col).select(
        quantize_half_away(F.col("_score_t") * F.lit(1e6)).alias("_sm"),
        F.col("_y"),
    )
    width = 1_000_000 // n_bins
    b = j.select(
        F.least(
            F.expr(f"_sm div {width}"), F.lit(n_bins - 1).cast("long")
        ).alias("bucket"),
        "_sm",
        "_y",
    )
    agg = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_sm").cast("long").alias("_sum_sm"),
    )
    return agg.select(
        "bucket",
        "n_docs",
        "n_pos",
        half_away_div_col("_sum_sm", "n_docs").alias("mean_score_micro"),
        q6_ratio_col("n_pos", "n_docs").alias("pos_rate_micro"),
        F.abs(
            half_away_div_col("_sum_sm", "n_docs")
            - q6_ratio_col("n_pos", "n_docs")
        ).cast("long").alias("gap_micro"),
    )


def dsir_scores(
    df: DataFrame,
    target_pred: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance scores for data selection (Xie et al.
    '23, "Data Selection for Language Models via Importance
    Resampling"): per document, the mean log-likelihood ratio of its
    hashed n-gram features under the TARGET distribution vs the RAW
    corpus distribution — the principled replacement for binary
    quality filters when the goal is "more data LIKE this slice".
    High score = looks like the target domain; resampling by these
    weights shifts the corpus mixture toward it.

    Model: both distributions are add-one-smoothed multinomials over
    the classifier's hashed bigram buckets (the hashing trick makes
    the feature space fixed at ``n_buckets`` regardless of corpus
    vocabulary — DSIR's own construction):

        p_b = (c_target,b + 1) / (N_target + B)
        q_b = (c_raw,b + 1)    / (N_raw + B)
        score(doc) = mean over features of [ln p_b − ln q_b]

    Exact-integer contract: each bucket's probability quantizes to an
    exact-integer 6dp ratio (q6_ratio, GREATEST(·,1) ln-domain clamp —
    the X146 Markov-panel rule), det_ln + micro-nat quantization run
    ONCE per bucket on the B-row panel, the per-doc score is an exact
    integer sum + half_away_div — the session-perplexity machinery
    pointed at feature space instead of state space. Docs with < 2
    tokens have no features and drop out (the classifier rule).

    Plan at 100 TB: feature hashing is scan-side column algebra; the
    two distribution builds are partial-aggregable counts on ≤ B keys
    (panel-sized, NOT data-sized); the scored join broadcasts the
    B-row micro-nat panel; one doc-keyed aggregate ends the plan. The
    corpus is never shuffled except by doc_id for its own aggregate.
    """
    from v3io_tsdb_spark.functions.detmath import (
        half_away_div_col,
        q6_ratio_col,
        with_det_many,
    )
    from v3io_tsdb_spark.functions.text import micro_nats

    if target_pred is None:
        target_pred = F.col("lang") == "en"
    from v3io_tsdb_spark.functions.share import shared

    feats = df.select(
        F.col(id_col),
        target_pred.cast("long").alias("_t"),
        F.explode(
            hashed_bigram_buckets(F.col(text_col), n_buckets)
        ).alias("bucket"),
    )
    # pre-aggregate to the (doc, bucket) count table and share() it:
    # feats had two consumers (distribution counts + the scored join),
    # each re-running the scan + tokenize + feature hash; g is the
    # metadata-narrow tf form (≤ docs × n_buckets rows) from which
    # both derive exactly — Σ_t·c and Σc reproduce the per-occurrence
    # sums as pure integer identities
    g = shared(
        feats.groupBy(id_col, "_t", "bucket").agg(F.count("*").alias("_c"))
    )
    counts = g.groupBy("bucket").agg(
        F.sum(F.col("_t") * F.col("_c")).cast("long").alias("_ct"),
        F.sum("_c").cast("long").alias("_cr"),
    )
    panel = (
        df.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_ct", F.lit(0)).cast("long").alias("_ct"),
            F.coalesce("_cr", F.lit(0)).cast("long").alias("_cr"),
        )
    )
    totals = panel.agg(
        F.sum("_ct").cast("long").alias("_nt"),
        F.sum("_cr").cast("long").alias("_nr"),
    )
    p = (
        panel.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (F.col("_ct") + F.lit(1)).alias("_pn"),
            (F.col("_nt") + F.lit(n_buckets)).alias("_pd"),
            (F.col("_cr") + F.lit(1)).alias("_qn"),
            (F.col("_nr") + F.lit(n_buckets)).alias("_qd"),
        )
        .select(
            "bucket",
            F.greatest(q6_ratio_col("_pn", "_pd"), F.lit(1).cast("long"))
            .alias("_p6"),
            F.greatest(q6_ratio_col("_qn", "_qd"), F.lit(1).cast("long"))
            .alias("_q6"),
        )
    )
    # both ladders in ONE SELECT (one analysis pass instead of two)
    p = with_det_many(p, [
        ("ln", "_lnp", F.col("_p6") / F.lit(1e6), "_dp_"),
        ("ln", "_lnq", F.col("_q6") / F.lit(1e6), "_dq_"),
    ])
    mn_panel = p.select(
        "bucket",
        (micro_nats(F.col("_lnp")) - micro_nats(F.col("_lnq"))).alias("_mn"),
    )
    return (
        g.join(F.broadcast(mn_panel), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_features"),
            F.sum(F.col("_c") * F.col("_mn")).cast("long").alias("_sum_mn"),
        )
        .select(
            id_col,
            "n_features",
            half_away_div_col("_sum_mn", "n_features").alias("dsir_micro"),
        )
    )
