"""rel=next/prev pagination: kernel admission, chain stitching
semantics (heads, positions, cycles, truncated chains)."""

from pyspark.sql import functions as F

from doctor_spark.kernels.links import extract_rel_pagination
from doctor_spark.operators.metadata import pagination_chains


def test_kernel_first_wins_and_admission():
    page = ('<html><head>'
            '<link rel="prev" href="https://s/p1">'
            '<link rel="NEXT" href="https://s/p3">'
            '<link rel="prev" href="https://s/ignored">'
            '</head></html>')
    assert extract_rel_pagination(page) == ("https://s/p3", "https://s/p1")
    # legacy token, relative target, missing href, soup
    assert extract_rel_pagination(
        '<link rel="previous" href="https://s/p0">'
    ) == (None, "https://s/p0")
    assert extract_rel_pagination('<link rel="next" href="/rel">') == (
        None, None)
    assert extract_rel_pagination('<link rel="next">') == (None, None)
    assert extract_rel_pagination(None) == (None, None)
    assert extract_rel_pagination(b"\xff\xfe junk") == (None, None)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _prev(href):
    return f'<link rel="prev" href="{href}">'


def test_chain_heads_and_positions(spark):
    rows = [
        ("https://a/p0", "<head></head>"),
        ("https://a/p1", _prev("https://a/p0")),
        ("https://a/p2", _prev("https://a/p1")),
        ("https://b/solo", "<head></head>"),
    ]
    got = {r["url"]: (r["head_url"], r["page_index"], r["resolved"])
           for r in pagination_chains(_pages(spark, rows)).collect()}
    assert got == {
        "https://a/p0": ("https://a/p0", 0, True),
        "https://a/p1": ("https://a/p0", 1, True),
        "https://a/p2": ("https://a/p0", 2, True),
        "https://b/solo": ("https://b/solo", 0, True),
    }


def test_truncated_chain_heads_at_missing_page(spark):
    # p1 was never crawled: p2's chain terminates at the UNSEEN p1
    rows = [("https://a/p2", _prev("https://a/p1"))]
    r = pagination_chains(_pages(spark, rows)).collect()[0]
    assert (r["head_url"], r["page_index"], r["resolved"]) == (
        "https://a/p1", 1, True)


def test_cycle_marked_unresolved(spark):
    rows = [
        ("https://a/x", _prev("https://a/y")),
        ("https://a/y", _prev("https://a/x")),
    ]
    out = pagination_chains(_pages(spark, rows), max_hops=8).collect()
    assert all(r["head_url"] is None and not r["resolved"] for r in out)
