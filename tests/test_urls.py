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


def test_url_path_template_rules(spark):
    from doctor_spark.functions.urls import url_path_template

    urls = [
        "https://h.com/article/12345/print",          # digits -> {n}
        "https://h.com/img/deadbeef01",                # hex w/ letter -> {hex}
        "https://h.com/u/123e4567-e89b-12d3-a456-426614174000",  # uuid
        "https://h.com/page-12/about",                 # mixed segment kept
        "https://h.com/DEADBEEF01",                    # uppercase hex kept
        "https://h.com/1234567",                       # short digits -> {n}
        "https://h.com/",                              # root -> ''
        "not a url",                                   # no host -> NULL
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select(
            "id", url_path_template(F.col("url")).alias("t")
        ).collect()
    }
    assert got[0] == "/article/{n}/print"
    assert got[1] == "/img/{hex}"
    assert got[2] == "/u/{uuid}"
    assert got[3] == "/page-12/about"
    assert got[4] == "/DEADBEEF01"
    assert got[5] == "/{n}"
    assert got[6] == ""
    assert got[7] is None


def test_url_template_counts_operator_and_plan(spark):
    from doctor_spark.operators.metadata import url_template_counts

    urls = [
        "https://a.com/article/1",
        "https://a.com/article/22",
        "https://a.com/about",
        "https://b.com/article/1",
        "relative/only",  # NULL host dropped
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    q = url_template_counts(df)
    rows = {(r.host, r.template): (r.n_urls, r.sample_url)
            for r in q.collect()}
    assert rows[("a.com", "/article/{n}")] == (2, "https://a.com/article/1")
    assert rows[("a.com", "/about")] == (1, "https://a.com/about")
    assert rows[("b.com", "/article/{n}")] == (1, "https://b.com/article/1")
    assert len(rows) == 3
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final   # ONE keyed aggregate
    assert "EvalPython" not in final, final       # zero Python
    assert "partial_count" in final or "HashAggregate" in final, final


class TestUrlLang:
    """url_lang / url_lang_stem — the STRAND marker rules."""

    CASES = [
        # (url, lang, stem)
        ("https://w.site.example/en/p1", "en",
         "https://w.site.example/{lang}/p1"),
        ("https://w.site.example/de-DE/p1", "de",
         "https://w.site.example/{lang}/p1"),
        ("http://h.example/pt_BR/a/en/b", "pt",        # first marker wins
         "http://h.example/{lang}/a/{lang}/b"),        # ...all replaced
        ("https://example.org/EN/p9", "en",            # case-blind match
         "https://example.org/{lang}/p9"),
        ("https://fr.example.org/doc", "fr",           # host label marker
         "https://{lang}.example.org/doc"),
        ("https://it.com/x", None, None),              # 2-label host: no
        ("https://plain.example/about", None, None),   # no marker
        ("https://w.example/enx/p", None, None),       # not whole-segment
        ("https://w.example/en-USA/p", None, None),    # bad region form
        ("relative/en/only", None, None),              # no authority
    ]

    def test_lang_and_stem(self, spark):
        from doctor_spark.functions.urls import url_lang, url_lang_stem
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(u,) for u, _, _ in self.CASES], "url string"
        )
        rows = df.select(
            "url",
            url_lang(F.col("url")).alias("lang"),
            url_lang_stem(F.col("url")).alias("stem"),
        ).collect()
        got = {r.url: (r.lang, r.stem) for r in rows}
        for url, lang, stem in self.CASES:
            assert got[url] == (lang, stem), url

    def test_query_dropped_from_stem(self, spark):
        from doctor_spark.functions.urls import url_lang_stem
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("https://a.example/en/p?utm_source=x&id=9",)], "url string"
        )
        r = df.select(url_lang_stem(F.col("url")).alias("s")).collect()[0]
        assert r.s == "https://a.example/{lang}/p"
