"""TextRank extractive summarization + VByte postings accounting."""

from doctor_spark.kernels.sentences import split_sentences


def textrank_summary(*a, **kw):
    from doctor_spark.operators.graph import textrank_summary as f

    return f(*a, **kw)


def postings_compression(*a, **kw):
    from doctor_spark.operators.postings import postings_compression as f

    return f(*a, **kw)


def _docs(spark, *texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


SUMM_ARMS = [
    "The court granted the motion today. The motion cited three prior"
    " rulings. Those rulings shaped the court docket. Unrelated weather"
    " news follows here.",
    "Counsel filed the appeal brief. The appeal brief raised two claims."
    " Judges reviewed the appeal brief.",
    "Spark executes the query plan. The query plan shuffles data.",
    "Alpha beta gamma. Delta epsilon zeta. Eta theta iota.",
]


class TestSummarySynthesisContract:
    def test_arms_are_clean_split(self):
        """The oracle splits on '. ' and re-appends the dot; the engine
        uses the real kernel splitter.  Pin their agreement per arm."""
        for text in SUMM_ARMS:
            parts = text.split(". ")
            simple = [
                p + "." if i < len(parts) - 1 else p
                for i, p in enumerate(parts)
            ]
            assert split_sentences(text) == simple, text


class TestTextrankSummary:
    def test_chain_doc_top2_and_isolated_dropped(self, spark):
        out = textrank_summary(_docs(spark, SUMM_ARMS[0]), k=4).collect()
        sidxs = {r["sidx"] for r in out}
        # sentence 3 ("Unrelated weather...") shares <2 words -> isolated
        assert 3 not in sidxs and sidxs <= {0, 1, 2}
        assert len(out) == 3  # k=4 but only 3 connected sentences

    def test_triangle_is_symmetric_tie_broken_by_sidx(self, spark):
        out = sorted(
            textrank_summary(_docs(spark, SUMM_ARMS[1]), k=3).collect(),
            key=lambda r: r["rank"],
        )
        assert [r["sidx"] for r in out] == [0, 1, 2]
        assert len({r["rank_micro"] for r in out}) == 1

    def test_edgeless_doc_emits_nothing(self, spark):
        assert textrank_summary(_docs(spark, SUMM_ARMS[3]), k=2).collect() == []

    def test_k_truncates_per_doc(self, spark):
        out = textrank_summary(
            _docs(spark, SUMM_ARMS[0], SUMM_ARMS[1]), k=2
        ).collect()
        per_doc = {}
        for r in out:
            per_doc.setdefault(r["doc_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2] for v in per_doc.values())

    def test_sentence_text_attached(self, spark):
        out = textrank_summary(_docs(spark, SUMM_ARMS[2]), k=1).collect()
        assert len(out) == 1
        assert out[0]["sentence"] in split_sentences(SUMM_ARMS[2])


class TestPostingsCompression:
    def test_small_gaps_one_byte_each(self, spark):
        # "law" in docs 0,1,2: gaps 1,1,1 -> 3 bytes vs 24 fixed
        out = {
            r["term"]: r
            for r in postings_compression(
                _docs(spark, "law a", "law b", "law c")
            ).collect()
        }
        r = out["law"]
        assert r["df"] == 3 and r["vbyte_bytes"] == 3
        assert r["fixed_bytes"] == 24
        assert r["ratio_micro"] == 3 * 1_000_000 // 24

    def test_large_gap_crosses_byte_boundary(self, spark):
        rows = [(0, "law"), (500, "law")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = postings_compression(df).collect()[0]
        # gaps: 0+1=1 (1 byte), 500-0=500 >= 128 (2 bytes)
        assert out["vbyte_bytes"] == 3 and out["df"] == 2

    def test_first_gap_uses_id_plus_one(self, spark):
        rows = [(200, "law")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = postings_compression(df).collect()[0]
        assert out["vbyte_bytes"] == 2  # 201 >= 128

    def test_duplicate_tokens_count_once_per_doc(self, spark):
        out = postings_compression(
            _docs(spark, "law law law")
        ).collect()[0]
        assert out["df"] == 1
