"""Property tests (hypothesis) for the round-5 pipeline operators:
the distributed column-expression implementations must agree with a
direct Python simulation on arbitrary inputs — same oracle discipline
as the interpolation property suite, but for packing and repetition."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["train", "val"]),          # group
        st.integers(min_value=0, max_value=5000),   # n_tokens
    ),
    min_size=1,
    max_size=40,
)

texts_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy, budget=st.integers(min_value=1, max_value=512))
def test_pack_sequences_matches_simulation(spark, docs, budget):
    """pack_id/pack_offset equal a sequential concat-then-chunk walk."""
    from v3io_tsdb_spark.functions.packing import pack_sequences

    rows = [(i, grp, "en", n) for i, (grp, n) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, split string, lang string, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    # simulation: per group, docs in doc_id order, running start offset
    cursors: dict = {}
    for i, (grp, n) in enumerate(docs):
        start = cursors.get(grp, 0)
        assert got[i] == (start // budget, start % budget), (i, grp, n, budget)
        cursors[grp] = start + n


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy)
def test_repetition_stats_matches_simulation(spark, texts):
    """Duplicate n-gram ratios equal a direct Python recount, including
    whitespace-collapsing and shorter-than-n edge cases."""
    from v3io_tsdb_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    import re

    for i, t in enumerate(texts):
        # engine tokenization: split(lower(trim(text)), '\s+') — note an
        # empty string yields [''], one empty token, same as re.split
        toks = re.split(r"\s+", t.strip().lower())

        def ratio(n):
            if len(toks) - n + 1 <= 0:
                return 0.0
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            return 1.0 - len(set(grams)) / len(grams)

        assert abs(got[i]["dup_word_ratio"] - ratio(1)) < 1e-9, (i, t)
        assert abs(got[i]["dup_bigram_ratio"] - ratio(2)) < 1e-9, (i, t)
        assert abs(got[i]["dup_trigram_ratio"] - ratio(3)) < 1e-9, (i, t)
