"""URL-stage functions: canonicalization rules, registrable domain, and
cross-engine parity of the oracle's structural parser (every regex in
functions/urls.py must match at most once, or DuckDB's first-match
regexp_replace would diverge from Spark's replace-all)."""

import pyspark.sql.functions as F

from doctor_spark.functions.urls import (
    canonicalize_url,
    registrable_domain,
    url_host,
)


def _run(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    host = url_host(F.col("url"))
    rows = df.select(
        "id",
        canonicalize_url(F.col("url")).alias("canon"),
        host.alias("host"),
        registrable_domain(host).alias("dom"),
    ).collect()
    return {r["id"]: r for r in rows}


def test_canonicalize_rules(spark):
    got = _run(
        spark,
        [
            "HtTpS://WWW.Site3.Co.UK:443/Articles/12/?utm_source=feed&id=12#frag",
            "http://EXAMPLE.com:8080/a//?b=2&a=1&fbclid=xyz",
            "http://host.com:80/",
            "http://host.com:443/x",  # 443 under http is NOT default: kept
            "https://a.b.co.jp/p?ref=tw",
            "not a url#x",
            "http://single/path/",
            "http://h.com/p?",  # empty query -> no '?' in canon
        ],
    )
    assert got[0]["canon"] == "https://www.site3.co.uk/Articles/12?id=12"
    assert got[0]["host"] == "www.site3.co.uk"
    assert got[0]["dom"] == "site3.co.uk"  # www stripped, co.uk suffix
    assert got[1]["canon"] == "http://example.com:8080/a?a=1&b=2"
    assert got[2]["canon"] == "http://host.com"
    assert got[3]["canon"] == "http://host.com:443/x"
    assert got[4]["canon"] == "https://a.b.co.jp/p"
    assert got[4]["dom"] == "b.co.jp"
    assert got[5]["canon"] == "not a url" and got[5]["dom"] is None
    assert got[6]["canon"] == "http://single/path" and got[6]["dom"] == "single"
    assert got[7]["canon"] == "http://h.com/p"


def test_null_and_empty_inputs(spark):
    df = spark.createDataFrame([(0, None), (1, "")], "id long, url string")
    rows = df.select(
        "id",
        canonicalize_url(F.col("url")).alias("canon"),
        registrable_domain(url_host(F.col("url"))).alias("dom"),
    ).collect()
    got = {r["id"]: r for r in rows}
    assert got[0]["canon"] is None and got[0]["dom"] is None
    assert got[1]["canon"] == "" and got[1]["dom"] is None


def test_tracking_param_case_sensitivity(spark):
    # the filter is case-sensitive by contract: UTM_SOURCE is a distinct
    # key on the wire and survives (documented, matches the oracle)
    got = _run(spark, ["http://h.com/p?UTM_SOURCE=x&utm_x=y&gclid=1&z=9"])
    assert got[0]["canon"] == "http://h.com/p?UTM_SOURCE=x&z=9"


def test_surt_key_rules(spark):
    from doctor_spark.functions.urls import surt_key

    urls = [
        "HtTpS://WWW.Site3.Co.UK:443/Articles/12/?utm_source=f&id=12#x",
        "http://example.com/A/B?b=2&a=1",
        "http://single/",
        "not a url",
        "https://sub.host.org",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    got = {
        r["id"]: r["surt"]
        for r in df.select(
            "id", surt_key(F.col("url")).alias("surt")
        ).collect()
    }
    # www dropped, labels reversed, path lowercased, sorted query kept
    assert got[0] == "uk,co,site3)/articles/12?id=12"
    assert got[1] == "com,example)/a/b?a=1&b=2"
    assert got[2] == "single)"
    assert got[3] is None  # no authority -> no key
    assert got[4] == "org,host,sub)"
