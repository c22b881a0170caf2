"""Property tests for the round-9 operators: mixture weights must be a
true reweighting (expected post-weight token mix == the target recipe
restricted to present sources) on arbitrary corpora, and winnow
decontamination must honor the winnowing guarantee (any shared run of
>= w+k-1 tokens with the eval set is flagged at min_shared=1)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.text(alphabet="abcxyz0", min_size=1, max_size=6)
doc = st.lists(word, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), doc),
        min_size=1,
        max_size=12,
    ),
    t0=st.integers(1, 9),
    t1=st.integers(1, 9),
)
def test_mixture_weights_reweights_to_target(spark, docs, t0, t1):
    from v3io_tsdb_spark.functions.sampling import mixture_weights

    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    target = {"s0": float(t0), "s1": float(t1)}
    rows = {r["source"]: r for r in mixture_weights(df, target).collect()}
    tot = sum(r["n_tokens"] for r in rows.values())
    # invariants: shares sum to 1; absent-from-target sources weigh 0;
    # post-weight mix over PRESENT targeted sources matches the recipe
    assert abs(sum(r["actual_share"] for r in rows.values()) - 1.0) < 1e-4
    for s, r in rows.items():
        assert r["n_tokens"] >= 1  # every doc has >= 1 token
        if s not in target:
            assert r["weight"] == 0.0
        else:
            exp_share = target[s] / sum(target.values())
            assert abs(r["weight"] * r["n_tokens"] / tot - exp_share) < 1e-4


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    run=st.lists(word, min_size=8, max_size=12).map(" ".join),  # >= w+k-1 = 8
    pre=st.lists(word, min_size=0, max_size=10).map(" ".join),
    post=st.lists(word, min_size=0, max_size=10).map(" ".join),
    noise=doc,
)
def test_winnow_decontaminate_guarantee(spark, run, pre, post, noise):
    """k=5, w=4: a training doc embedding a shared >= 8-token run with
    an eval doc MUST surface at min_shared=1 — the SIGMOD'03 guarantee
    (every window of w consecutive shingles keeps its minimum, and an
    8-token shared run spans a full window)."""
    from v3io_tsdb_spark.functions.text import winnow_decontaminate

    train_text = (pre + " " + run + " " + post).strip()
    df = spark.createDataFrame(
        [(1, train_text), (13, ("eval intro " + run + " outro").strip())],
        "doc_id long, text string",
    )
    out = winnow_decontaminate(
        df.where("doc_id % 10 != 3"),
        df.where("doc_id % 10 = 3"),
        min_shared=1,
    ).collect()
    assert any(r["doc_id"] == 1 for r in out)
