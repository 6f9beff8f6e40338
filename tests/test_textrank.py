"""TextRank corpus keywords — token gate, co-occurrence edge synthesis,
hub dominance, determinism of the integer PageRank ordering."""


def textrank_keywords(*a, **kw):
    from doctor_spark.operators.graph import textrank_keywords as f

    return f(*a, **kw)


def _docs(spark, *texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


class TestTextrank:
    def test_hub_word_ranks_first(self, spark):
        # "spark" co-occurs with every other word; satellites only with
        # the hub -> the hub must take rank 1
        docs = _docs(
            spark,
            "spark engine",
            "spark shuffle",
            "spark catalyst",
            "spark tungsten",
        )
        out = textrank_keywords(docs, k=10).collect()
        assert out[0]["word"] == "spark" and out[0]["rank"] == 1
        assert len(out) == 5
        # satellites are symmetric -> identical mass, tie broken by word
        sats = [r for r in out if r["word"] != "spark"]
        assert len({r["rank_micro"] for r in sats}) == 1
        assert [r["word"] for r in sats] == sorted(r["word"] for r in sats)

    def test_token_gate(self, spark):
        # short tokens, digits, mixed-case-with-punct and stopwords are
        # not nodes
        docs = _docs(spark, "the cat and dog ran 42 km by x9 trail")
        words = {
            r["word"]
            for r in textrank_keywords(
                docs, stopwords=("the", "and"), k=50
            ).collect()
        }
        assert "the" not in words and "and" not in words
        assert "42" not in words and "x9" not in words and "km" not in words
        assert {"cat", "dog", "ran", "trail"} <= words

    def test_repeated_adjacent_token_is_not_an_edge(self, spark):
        docs = _docs(spark, "echo echo echo")
        assert textrank_keywords(docs, k=10).collect() == []

    def test_k_truncates_with_dense_ranks(self, spark):
        docs = _docs(spark, "one two three four five six seven eight")
        out = textrank_keywords(docs, k=3).collect()
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_deterministic_across_runs(self, spark):
        docs = _docs(
            spark,
            "alpha bravo charlie alpha delta",
            "bravo delta echo charlie",
        )
        a = [tuple(r) for r in textrank_keywords(docs, k=50).collect()]
        b = [tuple(r) for r in textrank_keywords(docs, k=50).collect()]
        assert a == b and len(a) == 5
