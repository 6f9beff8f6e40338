"""Sitemap ingest kernel + operator (crawl-frontier stage; no reference
counterpart — doctor receives documents over HTTP)."""

from doctor_spark.kernels.sitemap import parse_sitemap

SF = "/root/testdata/sf0.01"


def test_urlset_full_fields_entities_and_skip():
    kind, e = parse_sitemap(
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e/a?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc> https://e/b </loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # loc-less: skipped
        "</urlset>"
    )
    assert kind == "urlset"
    assert e == [
        {
            "loc": "https://e/a?x=1&y=2",
            "lastmod": "2026-01-02",
            "changefreq": "daily",
            "priority": "0.8",
        },
        {"loc": "https://e/b", "lastmod": None, "changefreq": None,
         "priority": None},
    ]


def test_sitemapindex_and_namespace_prefix():
    kind, e = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://e/s1.xml</loc>"
        "<lastmod>2025-12-31</lastmod></sitemap></sitemapindex>"
    )
    assert kind == "sitemapindex"
    assert e[0]["loc"] == "https://e/s1.xml"
    assert e[0]["lastmod"] == "2025-12-31"
    kind, e = parse_sitemap(
        "<sm:urlset><sm:url><sm:loc>https://n/x</sm:loc></sm:url></sm:urlset>"
    )
    assert kind == "urlset" and e[0]["loc"] == "https://n/x"


def test_cdata_loc():
    kind, e = parse_sitemap(
        "<urlset><url><loc><![CDATA[https://e/b & c]]></loc></url></urlset>"
    )
    assert e == [
        {"loc": "https://e/b & c", "lastmod": None, "changefreq": None,
         "priority": None}
    ]


def test_plain_text_form():
    kind, e = parse_sitemap(
        "https://e/1\n# comment\n\nHTTPS://e/2\nftp://nope\n"
    )
    assert kind == "text"
    assert [x["loc"] for x in e] == ["https://e/1", "HTTPS://e/2"]


def test_non_sitemap_and_garbage():
    assert parse_sitemap("<html><body>page</body></html>") == (None, [])
    assert parse_sitemap(None) == (None, [])
    assert parse_sitemap(b"\xff\xfe junk") == (None, [])
    assert parse_sitemap("") == (None, [])
    parse_sitemap("<urlset><url><loc>x</loc>")  # unclosed: never raises


def test_sitemap_entries_operator_and_plan(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.sitemaps import sitemap_entries

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<urlset><url><loc>https://e/"),
                F.col("doc_id"),
                F.lit("</loc></url></urlset>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    q = sitemap_entries(df)
    r = q.where(F.col("doc_id") == 7).collect()
    assert len(r) == 1 and r[0].loc == "https://e/7" and r[0].kind == "urlset"
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert final.count("ArrowEvalPython") == 1, final


def test_frontier_admission_fused_plan(spark):
    """The fused frontier step: one Arrow stage (the sitemap parse),
    blocklist via broadcast probes only, the seen mark as one keyed
    join — never a cartesian product."""
    import __spark_entry__ as entry

    q = entry.queries()["frontier_admission"](spark, SF)
    rows = q.collect()
    by = {(r.doc_id, r.url): r for r in rows}
    # arm 0, doc 0: primary loc is blocked=False but SEEN -> not admitted
    r = by[(0, "https://s.example/p/0?a=1&b=2")]
    assert r.seen and not r.blocked and not r.admitted
    # arm 0, doc 4 (not %8): same loc unseen -> admitted
    r = by[(4, "https://s.example/p/4?a=1&b=2")]
    assert not r.seen and r.admitted
    # arm 2: t.example is blocklisted
    r = next(v for (d, u), v in by.items() if u.startswith("https://t.example/"))
    assert r.blocked and not r.admitted
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final and "NestedLoop" not in final
    assert final.count("ArrowEvalPython") == 1, final
