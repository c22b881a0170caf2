"""Token-window operators (dup_span_stats, token_chunks) and the
Gopher/C4-style quality-rule suite."""

from v3io_tsdb_spark.functions.chunking import dup_span_stats, token_chunks
from v3io_tsdb_spark.functions.text import quality_rules


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _w(n, start=0):
    return " ".join(f"w{start + i}" for i in range(n))


class TestDupSpans:
    def test_shared_span_counts_both_docs(self, spark):
        shared = _w(8)  # exactly one 8-token span
        docs = _docs(spark, [shared + " " + _w(4, 100), _w(4, 200) + " " + shared])
        out = {r["doc_id"]: r for r in dup_span_stats(docs, n=8).collect()}
        # doc0: 12 tokens -> 5 spans; span at position 0 is shared
        assert out[0]["n_spans"] == 5
        assert out[0]["n_dup_spans"] >= 1
        assert out[1]["n_dup_spans"] >= 1

    def test_short_doc_has_zero_spans(self, spark):
        out = dup_span_stats(_docs(spark, [_w(5)]), n=8).collect()[0]
        assert out["n_spans"] == 0
        assert out["n_dup_spans"] == 0
        assert out["dup_span_ratio"] == 0.0

    def test_within_doc_repeat_is_not_dup(self, spark):
        # one doc containing the same 8-token span twice, no other doc
        span = _w(8)
        docs = _docs(spark, [span + " " + _w(3, 50) + " " + span])
        out = dup_span_stats(docs, n=8).collect()[0]
        assert out["n_spans"] == 12  # 19 tokens -> 12 positions
        assert out["n_dup_spans"] == 0


class TestTokenChunks:
    def test_chunk_grid_and_tail(self, spark):
        out = token_chunks(_docs(spark, [_w(100)]), chunk=10, stride=8).collect()
        # 1 + ceil((100-10)/8) = 13 chunks; last start 96, 4 tokens
        assert len(out) == 13
        by_id = {r["chunk_id"]: r for r in out}
        assert by_id[0]["start"] == 0 and by_id[0]["n_chunk_tokens"] == 10
        assert by_id[12]["start"] == 96 and by_id[12]["n_chunk_tokens"] == 4

    def test_doc_smaller_than_chunk(self, spark):
        out = token_chunks(_docs(spark, [_w(5)]), chunk=10, stride=8).collect()
        assert len(out) == 1
        assert out[0]["n_chunk_tokens"] == 5

    def test_overlap_content_hash(self, spark):
        # stride < chunk: consecutive chunks share (chunk - stride) tokens,
        # and the hash is over the actual slice, so two docs whose slices
        # match produce identical chunk hashes
        a = token_chunks(_docs(spark, [_w(20)]), chunk=10, stride=5).collect()
        b = token_chunks(_docs(spark, [_w(10)]), chunk=10, stride=5).collect()
        h_a0 = [r["chunk_hash"] for r in a if r["chunk_id"] == 0][0]
        assert h_a0 == b[0]["chunk_hash"]

    def test_empty_text_yields_no_chunks(self, spark):
        assert token_chunks(_docs(spark, ["", _w(3)]), chunk=4, stride=4).count() == 1


class TestQualityRules:
    def test_each_rule_fires_independently(self, spark):
        good = "the cat sat on a mat and it is that " + _w(10)  # stopwords + varied
        short = "the a tiny one"  # < 15 tokens
        longword = ("the is " + _w(18) + " " + "x" * 30)  # one 30-char token
        nostop = _w(30)  # no stopwords at all
        repetitive = "the is " + " ".join(["spam"] * 28)  # top token 28/30
        rows = {
            r["doc_id"]: r
            for r in quality_rules(
                _docs(spark, [good, short, longword, nostop, repetitive])
            ).collect()
        }
        assert rows[0]["keep"] == 1
        assert rows[1]["r_len"] == 0 and rows[1]["keep"] == 0
        assert rows[2]["r_word_len"] == 0 and rows[2]["keep"] == 0
        assert rows[3]["r_stop"] == 0 and rows[3]["keep"] == 0
        assert rows[4]["r_top"] == 0 and rows[4]["keep"] == 0

    def test_metrics_values(self, spark):
        out = quality_rules(_docs(spark, ["aa bb aa the of"])).collect()[0]
        assert out["n_tokens"] == 5
        assert out["max_token_len"] == 3
        assert out["n_stopwords"] == 2
        assert abs(out["top_token_ratio"] - 0.4) < 1e-9


class TestMixtureSample:
    def test_rates_follow_temperature(self, spark):
        """Largest source kept at ~top_rate; a 4x-smaller source at
        ~2x that rate under alpha=0.5; alpha=1 preserves proportions."""
        from v3io_tsdb_spark.functions.sampling import mixture_sample

        rows = [(i, "big") for i in range(4000)] + [
            (10_000 + i, "small") for i in range(1000)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        sel = mixture_sample(df, alpha=0.5, top_rate=0.25)
        by_src = {
            r["source"]: r["count"] for r in sel.groupBy("source").count().collect()
        }
        # big: ~25% of 4000 = ~1000; small: 25% * sqrt(4) = 50% of 1000 = ~500
        assert 850 <= by_src["big"] <= 1150
        assert 420 <= by_src["small"] <= 580
        # alpha=1: both sources at top_rate
        sel1 = mixture_sample(df, alpha=1.0, top_rate=0.25)
        b1 = {r["source"]: r["count"] for r in sel1.groupBy("source").count().collect()}
        assert 850 <= b1["big"] <= 1150
        assert 200 <= b1["small"] <= 300

    def test_rate_capped_at_one(self, spark):
        """A tiny source whose boosted rate exceeds 1.0 is kept whole."""
        from v3io_tsdb_spark.functions.sampling import mixture_sample

        rows = [(i, "big") for i in range(10000)] + [(20_000 + i, "tiny") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        sel = mixture_sample(df, alpha=0.0, top_rate=0.9)
        b = {r["source"]: r["count"] for r in sel.groupBy("source").count().collect()}
        assert b["tiny"] == 10  # rate min(1, 0.9 * 1000) = 1.0

    def test_membership_is_deterministic(self, spark):
        from v3io_tsdb_spark.functions.sampling import mixture_sample

        rows = [(i, "s%d" % (i % 3)) for i in range(999)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = {r["doc_id"] for r in mixture_sample(df).collect()}
        b = {r["doc_id"] for r in mixture_sample(df.repartition(7)).collect()}
        assert a == b
