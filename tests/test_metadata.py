"""Page-metadata + anchor-text kernels and operators (wave-9 web-corpus
stages; no reference counterpart — doctor discards <head> and strips
<a> tags, doctor/tasks.py:361-370)."""

import pytest

from doctor_spark.kernels.html_meta import extract_page_metadata
from doctor_spark.kernels.links import extract_anchors

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- kernel


def test_meta_full_head():
    m = extract_page_metadata(
        '<html lang="en"><head><title>A &amp; B</title>'
        '<meta name="description" content="d">'
        '<link rel="canonical" href="https://e/x">'
        '<meta property="og:title" content="og">'
        '<meta property="article:published_time" content="2024-01-01T00:00:00Z">'
        "</head><body></body></html>"
    )
    assert m == {
        "title": "A & B",
        "description": "d",
        "canonical_url": "https://e/x",
        "og_title": "og",
        "published_at": "2024-01-01T00:00:00Z",
        "lang_attr": "en",
        "refresh_url": None,
        "charset": None,
    }


def test_meta_title_is_rcdata():
    # browser RCDATA: markup inside <title> is literal text
    m = extract_page_metadata("<title> x <b>y</b>  z </title>")
    assert m["title"] == "x <b>y</b> z"
    # a <meta> "inside" the title region is text, not an element
    m = extract_page_metadata(
        '<title>t<meta name="description" content="no"></title>'
    )
    assert m["title"] == 't<meta name="description" content="no">'
    assert m["description"] is None


def test_meta_unclosed_title_yields_none():
    m = extract_page_metadata("<title>never closed <p>rest")
    assert m["title"] is None


def test_meta_first_wins_and_empty_skipped():
    m = extract_page_metadata(
        "<title></title><title>real</title>"
        '<meta name="description" content="first">'
        '<meta name="description" content="second">'
    )
    assert m["title"] == "real"
    assert m["description"] == "first"


def test_meta_case_insensitive_and_single_quotes():
    m = extract_page_metadata(
        "<HTML LANG='fr'><HEAD><TITLE>T</TITLE>"
        "<META NAME='Description' CONTENT='D'>"
        "<LINK REL='CANONICAL' HREF='https://c/1'></HEAD>"
    )
    assert m["lang_attr"] == "fr"
    assert m["title"] == "T"
    assert m["description"] == "D"
    assert m["canonical_url"] == "https://c/1"


def test_meta_rel_token_list():
    m = extract_page_metadata('<link rel="alternate canonical" href="/c">')
    assert m["canonical_url"] == "/c"
    m = extract_page_metadata('<link rel="canonicalish" href="/c">')
    assert m["canonical_url"] is None


def test_meta_published_precedence():
    # meta article:published_time beats <time datetime> wherever it appears
    m = extract_page_metadata(
        '<time datetime="1999-01-01">old</time>'
        '<meta property="article:published_time" content="2020-01-01">'
    )
    assert m["published_at"] == "2020-01-01"
    m = extract_page_metadata('<time datetime="1999-01-01">old</time>')
    assert m["published_at"] == "1999-01-01"


def test_meta_attr_entity_unescape_and_comment_decoy():
    m = extract_page_metadata(
        "<!-- <title>no</title> -->"
        '<title>R</title><meta name="description" content="x &amp; y">'
    )
    assert m["title"] == "R"
    assert m["description"] == "x & y"


def test_meta_bytes_none_and_garbage():
    assert extract_page_metadata(None) == {
        k: None
        for k in (
            "title description canonical_url og_title "
            "published_at lang_attr refresh_url charset".split()
        )
    }
    m = extract_page_metadata(b'<html lang="de"><title>B</title>')
    assert m["title"] == "B" and m["lang_attr"] == "de"
    # tag soup never raises
    extract_page_metadata("<<<>>><a <b <title x=<meta")
    extract_page_metadata(b"\xff\xfe\x00\x01 not html")


def test_meta_refresh_forms():
    # WHATWG declarative refresh: delay, ; or , separator, optional
    # url= key, optional quotes
    for content, want in [
        ("0; url=https://t/1", "https://t/1"),
        ('5;URL="https://t/2"', "https://t/2"),
        ("3.5 , url='https://t/3'", "https://t/3"),
        ("0;https://t/4", "https://t/4"),
        ("30", None),  # pure reload, no redirect target
    ]:
        m = extract_page_metadata(
            f"<meta http-equiv='Refresh' content=\"{content}\">"
            if '"' not in content
            else f"<meta http-equiv='Refresh' content='{content}'>"
        )
        assert m["refresh_url"] == want, content


def test_meta_charset_forms_first_wins_by_order():
    m = extract_page_metadata('<meta charset="UTF-8">')
    assert m["charset"] == "utf-8"
    m = extract_page_metadata(
        '<meta http-equiv="content-type" content="text/html; charset=Windows-1252">'
    )
    assert m["charset"] == "windows-1252"
    m = extract_page_metadata(
        '<meta http-equiv="content-type" content="text/html; charset=latin-1">'
        '<meta charset="utf-8">'
    )
    assert m["charset"] == "latin-1"  # document order, not form precedence


def test_meta_valueless_attrs_ignored():
    m = extract_page_metadata('<meta content="c"><meta name="description">')
    assert m["description"] is None


# -------------------------------------------------------------- anchors


def test_anchors_basic_admission_and_text():
    a = extract_anchors(
        '<a href=" http://E.com/a?x=1&amp;y=2 "><b>Click &gt; me</b></a>'
        '<a href="/rel">r</a><a href="javascript:void(0)">j</a>'
        '<a href="mailto:x@y">m</a>'
        "<A HREF='HTTPS://B.com/z'>  B  link </A>"
    )
    assert a == [
        ("http://E.com/a?x=1&y=2", "Click > me"),
        ("HTTPS://B.com/z", "B link"),
    ]


def test_anchors_implicit_close_and_eof_flush():
    # a new <a> implicitly closes the previous one; EOF flushes the last
    a = extract_anchors(
        '<a href="http://a/1">one<a href="http://a/2">two'
    )
    assert a == [("http://a/1", "one"), ("http://a/2", "two")]


def test_anchors_image_only_empty_text_kept_by_kernel():
    a = extract_anchors('<a href="http://a/i"><img src="x"></a>')
    assert a == [("http://a/i", "")]  # the operator drops empties, not the kernel


def test_anchors_bytes_and_none():
    assert extract_anchors(None) == []
    assert extract_anchors(b'<a href="http://h/1">t</a>') == [
        ("http://h/1", "t")
    ]


# ------------------------------------------------------------- operators


def test_page_metadata_operator(spark):
    from doctor_spark.operators.metadata import page_metadata

    df = spark.createDataFrame(
        [
            (1, '<html lang="en"><title>T1</title>'),
            (2, "<p>none</p>"),
            (3, None),
        ],
        "id int, html string",
    )
    rows = {
        r.id: r for r in page_metadata(df).orderBy("id").collect()
    }
    assert rows[1].title == "T1" and rows[1].lang_attr == "en"
    assert rows[2].title is None
    assert rows[3].title is None
    # binary input per the Iceberg contract
    bdf = spark.createDataFrame(
        [(b'<title>B</title>',)], "html binary"
    )
    assert page_metadata(bdf).collect()[0].title == "B"


def test_page_metadata_plan_map_only(spark):
    """Metadata extraction must stay map-only: scan -> ArrowEvalPython ->
    project, zero exchanges."""
    from doctor_spark.operators.metadata import page_metadata

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F_encode_html()
    )
    q = page_metadata(df)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert final.count("ArrowEvalPython") == 1, final


def F_encode_html():
    from pyspark.sql import functions as F

    return F.encode(
        F.concat(F.lit("<title>t"), F.col("doc_id"), F.lit("</title>")),
        "utf-8",
    ).alias("html")


def test_anchor_text_topk_operator(spark):
    from doctor_spark.operators.metadata import anchor_text_topk

    pages = spark.createDataFrame(
        [
            ('<a href="http://h/1">x</a><a href="http://h/2">y</a>',),
            ('<a href="http://H/3">x</a>',),
            ('<a href="http://h/4">z</a><a href="http://h/5"><img></a>',),
            ('<a href="http://g/1">x</a>',),
        ],
        "html string",
    )
    rows = anchor_text_topk(pages, k=2).collect()
    by = {(r.dst_host, r.anchor): (r.n_links, r.rank) for r in rows}
    # host h: x twice (rank 1), y/z tie at 1 -> y wins rank 2 by anchor asc
    assert by[("h", "x")] == (2, 1)
    assert by[("h", "y")] == (1, 2)
    assert ("h", "z") not in by  # k=2
    assert by[("g", "x")] == (1, 1)
    # empty-text image anchor contributed nothing
    assert all(r.anchor for r in rows)


def test_anchor_text_topk_plan_two_exchanges(spark):
    """One row-volume exchange (the keyed (host, anchor) count) plus the
    tiny host-window exchange; no broadcast, a single Arrow stage, and
    the rank limit pushed down as WindowGroupLimit."""
    from doctor_spark.operators.metadata import anchor_text_topk

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F_anchor_html()
    )
    q = anchor_text_topk(df, k=3)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastExchange" not in final
    assert final.count("Exchange hashpartitioning") == 2, final
    assert final.count("ArrowEvalPython") == 1, final
    assert "WindowGroupLimit" in final, final


def F_anchor_html():
    from pyspark.sql import functions as F

    return F.encode(
        F.concat(
            F.lit('<a href="http://t'),
            F.col("doc_id") % 5,
            F.lit('.example/p">a'),
            F.col("doc_id") % 3,
            F.lit("</a>"),
        ),
        "utf-8",
    ).alias("html")


# ------------------------------------------------- image/alt pairing


def test_image_alts_kernel_admission_and_srcset():
    from doctor_spark.kernels.links import extract_image_alts

    html = (
        '<img src="http://a.example/1.png" alt="one">'
        '<IMG SRC=" http://b.example/2.jpg " ALT=" two &amp;  half ">'
        '<img srcset="http://c.example/3.png 2x, http://d/4.png" alt="lazy">'
        '<img src="/rel.png" alt="rel">'
        '<img src="data:image/png;base64,AA" alt="data">'
        '<img src="http://e.example/5.png">'
        '<img src="http://f.example/6.png" alt="">'
    )
    assert extract_image_alts(html) == [
        ("http://a.example/1.png", "one"),
        ("http://b.example/2.jpg", "two & half"),
        ("http://c.example/3.png", "lazy"),  # first srcset candidate
        ("http://e.example/5.png", ""),  # missing alt kept by kernel
        ("http://f.example/6.png", ""),  # empty alt kept; operator drops
    ]


def test_image_alts_src_beats_srcset_and_first_attr_wins():
    from doctor_spark.kernels.links import extract_image_alts

    html = (
        '<img src="http://a/1.png" srcset="http://b/2.png 2x" alt="x">'
        '<img src="http://c/3.png" src="http://d/4.png" alt="y">'
    )
    assert extract_image_alts(html) == [
        ("http://a/1.png", "x"),
        ("http://c/3.png", "y"),
    ]


def test_image_alts_soup_bytes_none():
    from doctor_spark.kernels.links import extract_image_alts

    for soup in ['<img src="http://a/1.png', "<<<img>>", "", "<img>"]:
        assert isinstance(extract_image_alts(soup), list)
    assert extract_image_alts(None) == []
    assert extract_image_alts(
        '<img src="http://a/\xe9.png" alt="caf\xe9">'.encode("utf-8")
    ) == [("http://a/\xe9.png", "caf\xe9")]


def test_image_caption_table_operator(spark):
    from doctor_spark.operators.metadata import image_caption_table

    pages = spark.createDataFrame(
        [
            ('<img src="http://i/1.png" alt="cat">',),
            ('<img src="http://i/1.png" alt="cat">',),
            ('<img src="http://i/1.png" alt="dog">',),
            ('<img src="http://i/2.png" alt="b"><img src="http://i/2.png" alt="a">',),
            ('<img src="http://i/3.png" alt="">',),
        ],
        "html string",
    )
    rows = image_caption_table(pages).collect()
    by = {r.src: (r.alt, r.n_pairs) for r in rows}
    assert by["http://i/1.png"] == ("cat", 2)  # modal alt wins
    assert by["http://i/2.png"] == ("a", 1)  # tie -> alt asc
    assert "http://i/3.png" not in by  # decorative dropped


def test_image_caption_table_plan_two_exchanges(spark):
    """Same scale shape as anchor_text_topk: one row-volume keyed count
    exchange + the tiny src-window exchange, no broadcast, one Arrow
    stage, rank-1 pushed down as WindowGroupLimit."""
    from pyspark.sql import functions as F

    from doctor_spark.operators.metadata import image_caption_table

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.encode(
            F.concat(
                F.lit('<img src="http://i'),
                F.col("doc_id") % 5,
                F.lit('.example/a.png" alt="c'),
                F.col("doc_id") % 3,
                F.lit('">'),
            ),
            "utf-8",
        ).alias("html")
    )
    q = image_caption_table(df)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastExchange" not in final
    assert final.count("Exchange hashpartitioning") == 2, final
    assert final.count("ArrowEvalPython") == 1, final
    assert "WindowGroupLimit" in final, final


# -- robots-meta admission gate ----------------------------------------------


def test_robots_flags_kernel_directives():
    from doctor_spark.kernels.html_meta import extract_robots_flags as f

    assert f('<meta name="robots" content="noindex, nofollow">') == (True, True)
    assert f('<META NAME="ROBOTS" CONTENT="NONE">') == (True, True)
    assert f('<meta name="googlebot" content=" NoFollow ">') == (False, True)
    # union: a later index/follow never clears an earlier noindex
    assert f('<meta name=robots content=noindex>'
             '<meta name=robots content="index, follow">') == (True, False)
    assert f('<meta name="robots" content="all">') == (False, False)
    assert f('<meta name="robots" content="INDEX , unknown-directive">') \
        == (False, False)
    # body-position metas are honored; description metas are not robots
    assert f('<body><p>x</p><meta name=robots content=nofollow></body>') \
        == (False, True)
    assert f('<meta name="description" content="noindex">') == (False, False)


def test_robots_flags_kernel_poison():
    from doctor_spark.kernels.html_meta import extract_robots_flags as f

    assert f(None) == (False, False)
    assert f("") == (False, False)
    assert f(b'<meta name=robots content=noindex>') == (True, False)
    assert f(b"\xff\xfe\x00\x00garbage") in ((False, False), (True, False))
    assert f("<meta name=robots") == (False, False)  # truncated tag soup


def test_robots_meta_operator_and_plan(spark):
    from doctor_spark.operators.metadata import robots_meta_flags
    from doctor_spark.plans.checks import physical_plan

    df = spark.createDataFrame(
        [(1, b'<meta name="robots" content="none">'),
         (2, b"<p>plain</p>"), (3, None)],
        "doc_id long, html binary")
    q = robots_meta_flags(df)
    rows = {r["doc_id"]: (r["noindex"], r["nofollow"]) for r in q.collect()}
    assert rows == {1: (True, True), 2: (False, False), 3: (False, False)}
    plan = physical_plan(q)
    assert "Exchange" not in plan, plan
