"""Heading-outline kernel spec + operator plan contract."""

from doctor_spark.kernels.headings import MAX_HEADINGS, extract_headings

SF = "/root/testdata/sf0.001"


class TestKernel:
    def test_basic_outline_with_parents(self):
        rows, tr = extract_headings(
            b"<h1>Top</h1><h2>A</h2><h3>A1</h3><h2>B</h2><h1>Next</h1>"
        )
        assert not tr
        assert rows == [
            (0, 1, -1, "Top"),
            (1, 2, 0, "A"),
            (2, 3, 1, "A1"),
            (3, 2, 0, "B"),
            (4, 1, -1, "Next"),
        ]

    def test_first_heading_deeper_than_one_has_no_parent(self):
        rows, _ = extract_headings(b"<h3>Deep start</h3><h2>Up</h2>")
        assert rows == [(0, 3, -1, "Deep start"), (1, 2, -1, "Up")]

    def test_inline_markup_transparent_entities_whitespace(self):
        rows, _ = extract_headings(
            b"<h2>  Fish &amp; <em>Chips</em>\n shop </h2>"
        )
        assert rows == [(0, 2, -1, "Fish & Chips shop")]

    def test_empty_heading_dropped(self):
        rows, _ = extract_headings(b'<h2 id="x"></h2><h2> \n </h2><h1>K</h1>')
        assert rows == [(0, 1, -1, "K")]

    def test_nested_start_implicitly_closes(self):
        rows, _ = extract_headings(b"<h1>One<h2>Two</h2>")
        assert rows == [(0, 1, -1, "One"), (1, 2, 0, "Two")]

    def test_script_style_excluded(self):
        rows, _ = extract_headings(
            b"<h1>Real<script>var x = 'Fake';</script> title</h1>"
        )
        assert rows == [(0, 1, -1, "Real title")]

    def test_eof_open_heading_kept(self):
        rows, _ = extract_headings(b"<h2>Unclosed tail")
        assert rows == [(0, 2, -1, "Unclosed tail")]

    def test_none_garbage_undecodable(self):
        assert extract_headings(None) == ([], False)
        assert extract_headings(b"plain text, no tags") == ([], False)

    def test_truncation_flag_at_cap(self):
        html = b"".join(b"<h2>s%d</h2>" % i for i in range(MAX_HEADINGS + 5))
        rows, tr = extract_headings(html)
        assert len(rows) == MAX_HEADINGS and tr


class TestOperator:
    def test_rows_and_plan(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.operators.headings import heading_outline

        df = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id",
            F.encode(
                F.concat(
                    F.lit("<h1>Doc "), F.col("doc_id"),
                    F.lit("</h1><h2>Sec</h2>"),
                ),
                "utf-8",
            ).alias("html"),
        )
        q = heading_outline(df)
        rows = q.where(F.col("doc_id") == 7).orderBy("seq").collect()
        assert [(r.seq, r.level, r.parent, r.text, r.truncated)
                for r in rows] == [
            (0, 1, -1, "Doc 7", False),
            (1, 2, 0, "Sec", False),
        ]
        plan = q._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert final.count("ArrowEvalPython") == 1, final
        assert "Generate" in final, final
