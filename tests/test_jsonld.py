"""JSON-LD structured-data kernel + operator: node discovery order,
type matching, author/publisher shapes, malformed-block isolation,
CDATA verbatim-ness, and the zero-shuffle plan."""

import json

from pyspark.sql import functions as F

from doctor_spark.kernels.jsonld import (
    ARTICLE_TYPES,
    extract_structured_data as sd,
)
from doctor_spark.operators.metadata import structured_data
from doctor_spark.plans.checks import count_exchanges, physical_plan


def _page(*blocks: str) -> str:
    scripts = "".join(
        f'<script type="application/ld+json">{b}</script>' for b in blocks
    )
    return f"<html><head><title>t</title>{scripts}</head><body>x</body></html>"


def test_simple_news_article():
    block = json.dumps({
        "@context": "https://schema.org", "@type": "NewsArticle",
        "headline": "Court rules on appeal",
        "datePublished": "2024-03-01T08:00:00Z",
        "author": {"@type": "Person", "name": "A. Reporter"},
        "publisher": {"@type": "Organization", "name": "The Daily"},
    })
    r = sd(_page(block))
    assert r["ld_type"] == "NewsArticle"
    assert r["headline"] == "Court rules on appeal"
    assert r["date_published"] == "2024-03-01T08:00:00Z"
    assert r["author_name"] == "A. Reporter"
    assert r["publisher_name"] == "The Daily"
    assert (r["n_blocks"], r["n_bad"], r["n_nodes"]) == (1, 0, 1)


def test_graph_wrapper_and_document_order():
    """Yoast-style @graph: WebSite first, NewsArticle second — but a
    WebPage node in @graph BEFORE the article wins (document order,
    not type preference)."""
    block = json.dumps({"@context": "https://schema.org", "@graph": [
        {"@type": "Organization", "name": "Pub"},
        {"@type": "NewsArticle", "headline": "H1"},
        {"@type": "WebPage", "headline": "H2"},
    ]})
    r = sd(_page(block))
    assert r["ld_type"] == "NewsArticle" and r["headline"] == "H1"
    # wrapper object + 3 graph members
    assert r["n_nodes"] == 4


def test_top_level_array_and_type_list():
    block = json.dumps([
        {"@type": ["Thing", "BlogPosting"], "headline": "B",
         "author": "bare string author"},
    ])
    r = sd(_page(block))
    assert r["ld_type"] == "BlogPosting"
    assert r["author_name"] == "bare string author"


def test_author_list_of_objects():
    block = json.dumps({
        "@type": "Article", "headline": "x",
        "author": [{"name": "First A."}, {"name": "Second B."}],
    })
    assert sd(_page(block))["author_name"] == "First A."


def test_malformed_block_is_isolated():
    bad = '{"@type": "NewsArticle", "headline": "oops",}'  # trailing comma
    good = json.dumps({"@type": "Article", "headline": "good"})
    r = sd(_page(bad, good))
    assert r["headline"] == "good"
    assert (r["n_blocks"], r["n_bad"]) == (2, 1)


def test_first_matching_block_wins():
    b1 = json.dumps({"@type": "Article", "headline": "first"})
    b2 = json.dumps({"@type": "NewsArticle", "headline": "second"})
    r = sd(_page(b1, b2))
    assert r["headline"] == "first"
    assert r["n_nodes"] == 2  # later nodes still counted


def test_non_article_types_do_not_match():
    block = json.dumps({"@type": "Organization", "name": "Acme"})
    r = sd(_page(block))
    assert r["ld_type"] is None
    assert r["n_nodes"] == 1


def test_script_body_is_cdata_verbatim():
    """&amp; inside the JSON is NOT entity-decoded before json.loads
    (browser behavior); mime params on the type attr are accepted."""
    payload = '{"@type": "Article", "headline": "A &amp; B \\u00e9"}'
    page = ('<html><head><script type="application/LD+JSON; charset=utf-8">'
            f"{payload}</script></head></html>")
    r = sd(page)
    assert r["headline"] == "A &amp; B é"


def test_plain_and_other_scripts_ignored():
    page = ('<html><head><script>var x = {"@type": "Article"};</script>'
            '<script type="application/json">{"@type": "Article"}</script>'
            "</head></html>")
    r = sd(page)
    assert r["n_blocks"] == 0 and r["ld_type"] is None


def test_null_bytes_unclosed_and_empty_fields():
    assert sd(None)["n_blocks"] == 0
    assert sd(b"\xff\xfe garbage")["ld_type"] is None
    # unclosed script: HTMLParser flushes nothing usable; must not raise
    sd('<script type="application/ld+json">{"@type": "Article"')
    # empty-string headline -> None, never ""
    r = sd(_page(json.dumps({"@type": "Article", "headline": ""})))
    assert r["headline"] is None


def test_bytes_input_through_decode_ladder():
    block = json.dumps({"@type": "Article", "headline": "héllo"})
    r = sd(_page(block).encode("utf-8"))
    assert r["headline"] == "héllo"


def test_article_types_frozen():
    assert "NewsArticle" in ARTICLE_TYPES and "WebPage" in ARTICLE_TYPES


def test_operator_plan_zero_exchanges(spark):
    block = json.dumps({"@type": "Article", "headline": "h"})
    df = spark.createDataFrame(
        [(1, _page(block).encode())], "doc_id bigint, html binary"
    )
    q = structured_data(df)
    rows = q.collect()
    assert rows[0]["headline"] == "h" and rows[0]["n_blocks"] == 1
    assert count_exchanges(q) == 0, physical_plan(q)
    # exactly one kernel-eval node in the plan tree (the detail section
    # repeats the name without a trailing paren)
    assert physical_plan(q).count("ArrowEvalPython (") == 1
