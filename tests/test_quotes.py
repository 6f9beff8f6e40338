"""Quotation-span extraction — kernel spec, synthesis-arm pins, plan."""

import pytest

from doctor_spark.kernels.quotes import extract_quotes


class TestKernel:
    def test_straight_pair_offsets(self):
        t = 'He said "the motion is denied" in open court.'
        assert extract_quotes(t) == [(8, 30, "the motion is denied")]
        assert t[8:30] == '"the motion is denied"'

    def test_curly_pair(self):
        t = "“Curly quoted span here” trailing."
        assert extract_quotes(t) == [(0, 24, "Curly quoted span here")]

    def test_min_tokens_drops_scare_quotes(self):
        assert extract_quotes('A "tiny" quote only.') == []
        assert extract_quotes('A "big enough quote" here.') == [
            (2, 20, "big enough quote")
        ]

    def test_unclosed_yields_nothing(self):
        assert extract_quotes('open "never closed span words') == []

    def test_mismatched_delimiters_never_close(self):
        # a straight quote cannot close a curly opener — and per the
        # spec, an unclosed opener swallows the rest of the document
        # (only its own closer is special inside an open quote)
        assert extract_quotes('“curly open but straight close" words') == []
        assert extract_quotes('“x" then "a real quoted span" end') == []
        # the swallow ends at a real closer: spans resume after it
        t = '“mis" matched” then "a real quoted span" end'
        assert extract_quotes(t) == [(20, 40, "a real quoted span")]

    def test_multiple_spans_document_order(self):
        t = '"one two three" mid "four five six" end'
        assert [b for _, _, b in extract_quotes(t)] == [
            "one two three", "four five six"
        ]

    def test_none_and_blank(self):
        assert extract_quotes(None) == []
        assert extract_quotes("") == []

    def test_synthesis_arm_pins(self):
        # the literal offsets the q_quote_spans oracle replays
        assert extract_quotes(
            'He said "the motion is denied" in open court.'
        ) == [(8, 30, "the motion is denied")]
        assert extract_quotes("“Curly quoted span here” trailing.") == [
            (0, 24, "Curly quoted span here")
        ]
        assert extract_quotes('A "tiny" quote and "an unclosed one') == []
        assert extract_quotes("no quotes at all here.") == []


class TestOperator:
    @pytest.fixture(scope="class")
    def spans_df(self, spark):
        from doctor_spark.operators.quotes import quote_spans

        df = spark.createDataFrame(
            [(1, '"alpha bravo charlie" and "x"'), (2, "none")],
            "doc_id long, text string",
        )
        return quote_spans(df, min_tokens=3)

    def test_rows(self, spans_df):
        rows = spans_df.collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id, r.quote_idx, r.start_off, r.end_off) == (1, 1, 0, 21)
        assert r.quote_text == "alpha bravo charlie"

    def test_plan_map_only(self, spans_df):
        plan = spans_df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert final.count("ArrowEvalPython") == 1, final
