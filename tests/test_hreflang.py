"""hreflang alternate extraction + language-pair inventory: kernel
admission/normalization edges, operator semantics, plan shape."""

from pyspark.sql import functions as F

from doctor_spark.kernels.links import extract_hreflang
from doctor_spark.operators.metadata import (
    hreflang_edges,
    language_pair_counts,
)
from doctor_spark.plans.checks import count_exchanges, physical_plan


def _page(*links: str) -> str:
    return ("<html><head>" + "".join(links)
            + '</head><body><a href="https://x.io/">b</a></body></html>')


def _link(lang: str, href: str, rel: str = "alternate") -> str:
    return f'<link rel="{rel}" hreflang="{lang}" href="{href}">'


def test_kernel_admission_and_normalization():
    page = _page(
        _link("en-us", "https://ex.com/en"),
        _link("DE", "https://ex.com/de", rel="ALTERNATE stylesheet"),
        _link("x-default", "https://ex.com/"),
        _link("fr", "/fr"),                      # relative: dropped
        _link("pt-br", "HTTPS://ex.com/br"),     # scheme case-insensitive
        _link("zz!!", "https://ex.com/zz"),      # malformed tag: dropped
        '<link rel="alternate" href="https://ex.com/rss">',  # no hreflang
        '<a hreflang="es" href="https://ex.com/es">x</a>',   # <a>: skipped
    )
    assert extract_hreflang(page) == [
        ("en-US", "https://ex.com/en"),
        ("de", "https://ex.com/de"),
        ("x-default", "https://ex.com/"),
        ("pt-BR", "HTTPS://ex.com/br"),
    ]


def test_kernel_three_part_tags_and_soup():
    # zh-Hans-CN: only 2-letter parts after the first are region-cased
    page = _page(_link("ZH-hans-cn", "https://ex.com/zh"))
    assert extract_hreflang(page) == [("zh-hans-CN", "https://ex.com/zh")]
    assert extract_hreflang(None) == []
    assert extract_hreflang(b"\xff\xfe junk") == []
    assert extract_hreflang("<link rel=alternate hreflang=en") == []


def test_kernel_duplicates_kept_in_document_order():
    page = _page(
        _link("en", "https://a/1"), _link("en", "https://a/2")
    )
    assert [t for t, _ in extract_hreflang(page)] == ["en", "en"]


def test_edges_and_pairs(spark):
    rows = [
        (1, _page(_link("en", "https://a/en"), _link("fr", "https://a/fr"),
                  _link("de", "https://a/de"))),
        (2, _page(_link("en", "https://b/en"), _link("fr", "https://b/fr"))),
        (3, _page(_link("x-default", "https://c/"),
                  _link("en", "https://c/en"))),
        (4, _page(_link("fr", "https://d/fr"))),
        (5, _page()),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    edges = hreflang_edges(df)
    assert edges.count() == 3 + 2 + 2 + 1
    got = {
        (r["lang_a"], r["lang_b"]): r["n_pages"]
        for r in language_pair_counts(df).collect()
    }
    assert got == {
        ("de", "en"): 1, ("de", "fr"): 1, ("en", "fr"): 2,
    }


def test_pair_plan_one_exchange(spark):
    df = spark.createDataFrame(
        [(1, _page(_link("en", "https://a/en")))],
        "doc_id bigint, html string",
    )
    language_pair_counts(df).collect()  # executes end-to-end
    q = language_pair_counts(df)        # fresh plan, pre-AQE-finalize
    plan = physical_plan(q)
    assert count_exchanges(q) == 1, plan
    assert plan.count("ArrowEvalPython (") == 1, plan
    assert "partial_count" in plan, plan
