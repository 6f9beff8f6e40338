"""Href-extraction kernel (kernels/links.py) + host-edge operator: the
kernel's generality BEYOND what the driver oracle's regex replay can
express — tag soup, unquoted attributes, entity refs, encoding ladder —
plus the Spark edge rollup end-to-end."""

import pytest

from doctor_spark.kernels.links import extract_hrefs


def test_basic_absolute_links_in_order():
    html = (
        '<p>x</p><a href="http://a.example/1">1</a>'
        "<a href='https://b.example/2'>2</a>"
        '<a href="http://a.example/1">again</a>'
    )
    assert extract_hrefs(html) == [
        "http://a.example/1",
        "https://b.example/2",
        "http://a.example/1",  # duplicates kept; edge dedup is downstream
    ]


def test_non_web_schemes_and_relative_dropped():
    html = (
        '<a href="/rel">r</a><a href="foo/bar">r2</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="mailto:x@example.com">m</a>'
        '<a href="ftp://h/f">f</a>'
        '<a href="HTTP://ok.example/">k</a>'
        '<a href="http:/missing-slashes">bad</a>'
    )
    assert extract_hrefs(html) == ["HTTP://ok.example/"]


def test_entities_whitespace_case_and_unquoted():
    html = (
        '<A HREF=" http://a.example/?x=1&amp;y=2 ">e</A>'
        "<a href=http://unquoted.example/p>u</a>"
        '<a id="z" href="http://late-attr.example">l</a>'
        '<a href="http://first.example" href="http://second.example">d</a>'
    )
    assert extract_hrefs(html) == [
        "http://a.example/?x=1&y=2",
        "http://unquoted.example/p",
        "http://late-attr.example",
        "http://first.example",  # first href wins, like browsers
    ]


def test_tag_soup_never_raises():
    soups = [
        '<a href="http://a.example/1">unclosed',
        '<div><a href="http://a.example/2"></div></a>',
        '<a href="http://a.example/3',  # truncated inside the tag
        "<<<>><a<>",
        '<a name="no-href">plain</a>',
        "",
    ]
    for soup in soups:
        assert isinstance(extract_hrefs(soup), list)
    assert extract_hrefs(soups[0]) == ["http://a.example/1"]
    assert extract_hrefs(soups[1]) == ["http://a.example/2"]


def test_none_and_bytes_ladder():
    assert extract_hrefs(None) == []
    assert extract_hrefs(b'<a href="http://a.example/b">x</a>') == [
        "http://a.example/b"
    ]
    # cp1252-only bytes: the ladder decodes (never raises), href survives
    raw = '<p>caf\xe9</p><a href="http://c.example/">c</a>'.encode("cp1252")
    assert extract_hrefs(raw) == ["http://c.example/"]


def test_host_link_edges_rollup(spark):
    from doctor_spark.operators.graph import host_link_edges, out_degrees

    rows = [
        (
            "src1.example",
            b'<a href="http://DST1.Example:8080/p">1</a>'
            b'<a href="https://dst2.example/q#frag">2</a>'
            b'<a href="/rel">r</a>'
            b'<a href="http://dst1.example/other">dup-host</a>',
        ),
        ("src2.example", b'<a href="http://src2.example/self">s</a>'),
        ("src3.example", None),
    ]
    pages = spark.createDataFrame(rows, "src_host string, html binary")
    edges = host_link_edges(pages)
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [
        ("src1.example", "dst1.example"),
        ("src1.example", "dst1.example"),
        ("src1.example", "dst2.example"),
        ("src2.example", "src2.example"),
    ]
    deduped = sorted(
        (r.src, r.dst, r.deg) for r in out_degrees(edges).collect()
    )
    assert deduped == [
        ("src1.example", "dst1.example", 2),
        ("src1.example", "dst2.example", 2),
    ]


def test_warc_to_host_edges_end_to_end(spark, tmp_path):
    """The full crawl-ingest composition: WARC file → read_warc_pages →
    url_host(src) → host_link_edges.  This is the cc-webgraph shape
    (crawl archive in, host edge table out) with no glue code beyond
    column selection."""
    import datetime as dt

    from pyspark.sql import functions as F

    from doctor_spark.functions.urls import url_host
    from doctor_spark.operators.graph import host_link_edges
    from doctor_spark.sources.warc import build_warc

    ts = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    records = [
        {"url": "https://a.test/p1", "warc_ts": ts,
         "html": b'<html><a href="http://b.test/x">b</a>'
                 b'<a href="/rel">r</a>'
                 b'<a href="HTTPS://C.TEST:8443/y">c</a></html>'},
        {"url": "https://b.test/p2", "warc_ts": ts,
         "html": b'<a href="http://a.test/z">back</a>'},
        {"url": "https://c.test/bin", "warc_ts": ts,
         "html": bytes(range(256))},  # undecodable binary: no edges
    ]
    p = tmp_path / "crawl.warc"
    p.write_bytes(build_warc(records))

    from doctor_spark.sources.warc import read_warc_pages

    pages = read_warc_pages(spark, str(p)).select(
        url_host(F.col("url")).alias("src_host"), "html"
    )
    got = sorted((r.src, r.dst) for r in host_link_edges(pages).collect())
    assert got == [
        ("a.test", "b.test"),
        ("a.test", "c.test"),
        ("b.test", "a.test"),
    ]


def test_streaming_host_edges_match_batch(spark, tmp_path):
    """host_link_edges is a stateless Arrow map + explode, so it must run
    unchanged under Structured Streaming and produce exactly the batch
    edge set on the same files."""
    src = str(tmp_path / "pages")
    rows = [
        (f"h{i}.example",
         f'<a href="http://t{i % 3}.example/p">x</a>'
         f'<a href="https://t{(i + 1) % 3}.example/q">y</a>'.encode())
        for i in range(20)
    ]
    from doctor_spark.operators.graph import host_link_edges

    spark.createDataFrame(
        rows, "src_host string, html binary"
    ).write.parquet(src)

    batch = sorted(
        (r.src, r.dst)
        for r in host_link_edges(spark.read.parquet(src)).collect()
    )

    stream_in = spark.readStream.schema(
        "src_host string, html binary"
    ).parquet(src)
    q = (
        host_link_edges(stream_in)
        .writeStream.format("memory").queryName("edge_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.src, r.dst)
        for r in spark.sql("SELECT * FROM edge_stream").collect()
    )
    assert got == batch and len(got) == 40
