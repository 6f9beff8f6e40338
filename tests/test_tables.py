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
