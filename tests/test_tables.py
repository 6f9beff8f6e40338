"""HTML table extraction kernel + operators (web-table ingest; no
reference counterpart — doctor flattens tables into running text,
doctor/tasks.py:361-370)."""

from doctor_spark.kernels.tables import extract_tables

SF = "/root/testdata/sf0.01"


def test_tables_basic_grid_entities_ws():
    t = extract_tables(
        "<table><tr><th>H1</th><th> H2 </th></tr>"
        "<tr><td>a</td><td>b &amp; c</td></tr></table>"
    )
    assert t == [[["H1", "H2"], ["a", "b & c"]]]


def test_tables_implicit_closes_and_uppercase():
    t = extract_tables("<TABLE><TR><TD> x <TD>y<TR><TD>z</TABLE>")
    assert t == [[["x", "y"], ["z"]]]


def test_tables_nested_isolated_and_indexed_by_start():
    t = extract_tables(
        "<table><tr><td>outer<table><tr><td>inner</td></tr>"
        "</table>tail</td></tr></table>"
    )
    # inner table is its own table; text around it stays in the outer
    # cell (literal data concatenation — no synthetic separator)
    assert t == [[["outertail"]], [["inner"]]]


def test_tables_thead_tbody_transparent():
    t = extract_tables(
        "<table><thead><tr><th>h</th></tr></thead>"
        "<tbody><tr><td>d</td></tr></tbody></table>"
    )
    assert t == [[["h"], ["d"]]]


def test_tables_text_outside_cells_dropped():
    t = extract_tables(
        "<table><caption>cap</caption>stray<tr>row-stray<td></td>"
        "<td>  </td></tr></table>"
    )
    assert t == [[["", ""]]]  # empty cells survive, strays don't


def test_tables_inline_markup_contributes_text():
    assert extract_tables("<table><tr><td>a<b>bold</b>c</td></tr></table>") == [
        [["aboldc"]]
    ]


def test_tables_unclosed_flush_and_soup():
    assert extract_tables("<table><tr><td>unclosed") == [[["unclosed"]]]
    assert extract_tables("</table><td>x</td><tr>") == []
    extract_tables("<<<table><tr x=<td")  # never raises


def test_tables_bytes_none_empty():
    assert extract_tables(None) == []
    assert extract_tables(b"<table><tr><td>b</td></tr></table>") == [[["b"]]]
    assert extract_tables("<table></table>") == [[]]


def test_table_cells_operator_and_plan(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.tables import table_cells

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<table><tr><td>c"),
                F.col("doc_id"),
                F.lit("</td><td>d</td></tr></table>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    q = table_cells(df)
    rows = q.where(F.col("doc_id") == 3).orderBy("col").collect()
    assert [(r.tbl, r.row, r.col, r.cell) for r in rows] == [
        (0, 0, 0, "c3"),
        (0, 0, 1, "d"),
    ]
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert final.count("ArrowEvalPython") == 1, final
    assert "Generate" in final, final  # the explode is a fan-out, not a shuffle


def test_table_stats_operator(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.tables import table_stats

    df = spark.createDataFrame(
        [
            ("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>",),
            ("<p>none</p>",),
        ],
        "html string",
    )
    rows = table_stats(df).collect()
    by = {r.html[:3]: r for r in rows}
    r = by["<ta"]
    assert (r.n_tables, r.n_rows, r.n_cells, r.max_cols) == (1, 2, 3, 2)
    r = by["<p>"]
    assert (r.n_tables, r.n_rows, r.n_cells, r.max_cols) == (0, 0, 0, 0)


def test_code_blocks_kernel_contract():
    from doctor_spark.kernels.codeblocks import extract_code_blocks as C

    # whitespace is the payload: verbatim text, entities decoded
    assert C("<pre>\ndef f():\n    return 1 &lt; 2\n</pre>") == [
        (None, "def f():\n    return 1 < 2\n")
    ]
    # language hints from pre or inner code class (highlight.js/GFM)
    assert C('<pre><code class="language-python">x</code></pre>') == [
        ("python", "x")
    ]
    assert C('<PRE CLASS="lang-C++">int;</PRE>') == [("c++", "int;")]
    # inline <code> outside <pre> is prose, not a block
    assert C("<p>see <code>x</code></p>") == []
    # <br> is a line break inside a block; inline markup contributes text
    assert C("<pre>x<br>y<b>!</b></pre>") == [(None, "x\ny!")]
    # spec's single post-<pre> newline drop; empties skipped; EOF flush
    assert C("<pre>\n</pre><pre></pre>") == []
    assert C("<pre>unclosed\n  indent") == [(None, "unclosed\n  indent")]
    assert C(None) == [] and C(b"<pre>b</pre>") == [(None, "b")]


def test_code_blocks_operator(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.codeblocks import code_blocks

    df = spark.createDataFrame(
        [('<pre class="language-go">a\nb</pre><pre>c</pre>',), ("<p>n</p>",)],
        "html string",
    )
    rows = code_blocks(df).orderBy("blk").collect()
    assert [(r.blk, r.lang_hint, r.code, r.n_lines, r.n_chars) for r in rows] == [
        (0, "go", "a\nb", 2, 3),
        (1, None, "c", 1, 1),
    ]
    plan = code_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
