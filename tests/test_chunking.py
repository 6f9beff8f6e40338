"""Boundary-aware chunking — kernel spec edges and operator plan."""

import pytest

from doctor_spark.kernels.chunking import chunk_text


class TestKernel:
    def test_paragraph_packing(self):
        t = "one two three.\n\nfour five.\n\nsix seven eight nine ten."
        assert chunk_text(t, 6) == [
            (1, 5, "para", "one two three.\n\nfour five."),
            (2, 5, "para", "six seven eight nine ten."),
        ]

    def test_oversize_paragraph_sentence_packs(self):
        t = "A b c. D e f. G h i."
        # 9-token paragraph over a 7 budget -> sentences pack 3+3, then 3
        assert chunk_text(t, 7) == [
            (1, 6, "sent", "A b c. D e f."),
            (2, 3, "sent", "G h i."),
        ]

    def test_oversize_sentence_hard_splits(self):
        assert chunk_text("w1 w2 w3 w4 w5 w6 w7", 3) == [
            (1, 3, "hard", "w1 w2 w3"),
            (2, 3, "hard", "w4 w5 w6"),
            (3, 1, "hard", "w7"),
        ]

    def test_hard_pieces_never_share_chunks(self):
        # short sentence, oversize sentence, short sentence: the shorts
        # never merge with hard pieces
        t = "A b. C1 c2 c3 c4 c5. D e."
        assert chunk_text(t, 4) == [
            (1, 2, "sent", "A b."),
            (2, 4, "hard", "C1 c2 c3 c4"),
            (3, 1, "hard", "c5."),
            (4, 2, "sent", "D e."),
        ]

    def test_sentences_never_merge_into_paragraph_chunk(self):
        # a small paragraph then an oversize one: the pending paragraph
        # chunk flushes before sentence packing starts
        t = "tiny para.\n\nS one two. S three four. S five six seven."
        out = chunk_text(t, 5)
        assert out[0] == (1, 2, "para", "tiny para.")
        assert all(k in ("sent",) for _, _, k, _ in out[1:])

    def test_blank_and_none(self):
        assert chunk_text(None, 5) == []
        assert chunk_text("", 5) == []
        assert chunk_text(" \n \n ", 5) == []

    def test_blank_line_runs_with_tabs(self):
        t = "p one.\n \t\n\n\np two."
        assert chunk_text(t, 10) == [(1, 4, "para", "p one.\n\np two.")]

    def test_max_tokens_validation(self):
        with pytest.raises(ValueError):
            chunk_text("x", 0)


class TestOperator:
    @pytest.fixture(scope="class")
    def chunks_df(self, spark):
        from doctor_spark.operators.chunking import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b c.\n\nd e."), (2, "   ")],
            "doc_id long, text string",
        )
        return chunk_documents(df, max_tokens=10)

    def test_rows(self, chunks_df):
        rows = chunks_df.collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id, r.chunk_idx, r.n_tokens, r.kind) == (1, 1, 5, "para")
        assert r.chunk_text == "a b c.\n\nd e."

    def test_plan_map_only(self, chunks_df):
        plan = chunks_df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert final.count("ArrowEvalPython") == 1, final
        assert "Generate" in final, final
