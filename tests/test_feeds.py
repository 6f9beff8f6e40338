"""RSS/Atom feed ingest kernel + operator (CC-News-style discovery; no
reference counterpart — doctor receives documents over HTTP)."""

from doctor_spark.kernels.feeds import parse_feed

SF = "/root/testdata/sf0.01"


def test_rss_items_cdata_entities_pubdate():
    kind, e = parse_feed(
        '<rss version="2.0"><channel><title>chan</title>'
        "<link>https://c/</link>"
        "<item><title><![CDATA[Big <News> & More]]></title>"
        "<link>https://c/1</link>"
        "<pubDate>Tue, 18 Aug 2026 06:00:00 GMT</pubDate></item>"
        "<item><title>T &amp; 2</title></item>"
        "</channel></rss>"
    )
    assert kind == "rss"
    assert e == [
        {
            "title": "Big <News> & More",
            "link": "https://c/1",
            "published": "Tue, 18 Aug 2026 06:00:00 GMT",
        },
        {"title": "T & 2", "link": None, "published": None},
    ]


def test_rss_channel_fields_not_leaked():
    # channel-level title/link belong to the feed, not to any entry
    kind, e = parse_feed(
        "<rss><channel><title>chan</title><link>https://c/</link>"
        "<item><title>only</title></item></channel></rss>"
    )
    assert e == [{"title": "only", "link": None, "published": None}]


def test_atom_alternate_beats_self_and_updated_fallback():
    kind, e = parse_feed(
        "<feed><title>a</title><entry><title>E1</title>"
        '<link rel="self" href="https://a/self"/>'
        '<link rel="alternate" href="https://a/e1"/>'
        "<updated>2026-08-18T00:00:00Z</updated></entry>"
        '<entry><title>E2</title><link href="https://a/e2"/>'
        "<published>2026-08-16</published>"
        "<updated>2026-08-17</updated></entry></feed>"
    )
    assert kind == "atom"
    assert e[0]["link"] == "https://a/e1"  # alternate wins over self
    assert e[0]["published"] == "2026-08-18T00:00:00Z"
    assert e[1]["link"] == "https://a/e2"  # relless == alternate
    assert e[1]["published"] == "2026-08-16"  # published beats updated


def test_atom_self_only_link_still_fills():
    _, e = parse_feed(
        "<feed><entry><title>x</title>"
        '<link rel="self" href="https://a/self"/></entry></feed>'
    )
    assert e[0]["link"] == "https://a/self"


def test_dc_date_and_namespace_prefixes():
    _, e = parse_feed(
        "<rss><channel><item><title>t</title>"
        "<dc:date>2026-08-17</dc:date></item></channel></rss>"
    )
    assert e[0]["published"] == "2026-08-17"


def test_skip_empty_entries_and_garbage():
    kind, e = parse_feed(
        "<rss><channel><item><guid>g</guid></item>"
        "<item><title>keep</title></item></channel></rss>"
    )
    assert [x["title"] for x in e] == ["keep"]
    assert parse_feed("<html>no</html>") == (None, [])
    assert parse_feed(None) == (None, [])
    assert parse_feed(b"\xff\xfe junk") == (None, [])
    parse_feed("<rss><channel><item><title>unclosed")  # never raises


def test_feed_entries_operator_and_plan(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.feeds import feed_entries

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<rss><channel><item><title>t"),
                F.col("doc_id"),
                F.lit('</title><link>https://f/'),
                F.col("doc_id"),
                F.lit("</link></item></channel></rss>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    q = feed_entries(df)
    r = q.where(F.col("doc_id") == 5).collect()
    assert len(r) == 1 and r[0].link == "https://f/5" and r[0].kind == "rss"
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert final.count("ArrowEvalPython") == 1, final
