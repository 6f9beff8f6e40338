"""RFC 9309 robots.txt kernel + gate operator.

The kernel cases pin the spec corners crawlers classically get wrong:
specific-agent groups EXCLUDE the ``*`` group, longest-pattern wins with
Allow on ties, ``*``/``$`` pattern forms, empty-pattern no-ops, and
rules outside any group.  The Spark test pins the scale contract: the
page side of the join never crosses into Python.
"""

from doctor_spark.kernels.robots import (
    compile_robots,
    pattern_to_regex,
    robots_allowed,
)

AGENT = "trainingbot/1.0"


def test_empty_and_missing_bodies_allow_everything():
    assert robots_allowed(None, AGENT, "/x") is True
    assert robots_allowed("", AGENT, "/x") is True
    assert robots_allowed("Sitemap: https://e.test/s.xml\n", AGENT, "/x") is True


def test_specific_group_excludes_star_group():
    body = (
        "User-agent: trainingbot\n"
        "Disallow: /no-train/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    # the * group's Disallow: / must NOT leak into the trainingbot verdict
    assert robots_allowed(body, AGENT, "/anything") is True
    assert robots_allowed(body, AGENT, "/no-train/x") is False
    # an unrelated agent falls back to * and is blocked everywhere
    assert robots_allowed(body, "otherbot", "/anything") is False


def test_longest_agent_token_wins_and_same_token_groups_merge():
    body = (
        "User-agent: training\n"
        "Disallow: /a/\n"
        "User-agent: trainingbot\n"
        "Disallow: /b/\n"
        "User-agent: trainingbot\n"
        "Disallow: /c/\n"
    )
    assert robots_allowed(body, AGENT, "/a/x") is True   # shorter token loses
    assert robots_allowed(body, AGENT, "/b/x") is False
    assert robots_allowed(body, AGENT, "/c/x") is False  # merged group


def test_longest_match_wins_and_allow_wins_ties():
    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public/\n"
    )
    assert robots_allowed(body, AGENT, "/private/x") is False
    assert robots_allowed(body, AGENT, "/private/public/x") is True
    tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*/\n"
    # equal-length patterns (7 octets): Allow wins the tie
    assert robots_allowed(tie, AGENT, "/dir/x") is True


def test_wildcard_and_end_anchor():
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/logs/\n"
    )
    assert robots_allowed(body, AGENT, "/docs/a.pdf") is False
    assert robots_allowed(body, AGENT, "/docs/a.pdf?x=1") is True  # $ anchored
    assert robots_allowed(body, AGENT, "/tmp123/logs/y") is False
    assert robots_allowed(body, AGENT, "/tmp123/other") is True


def test_syntax_tolerance():
    body = (
        "﻿# header comment\n"
        "USER-AGENT : *   # trailing comment\n"
        "Disallow: /x/\n"
        "garbage line without a colon\n"
        "Disallow:\n"          # empty pattern: no-op, not allow-all/deny-all
        "Crawl-delay: 10\n"
    )
    assert robots_allowed(body, AGENT, "/x/1") is False
    assert robots_allowed(body, AGENT, "/y") is True
    assert robots_allowed(b"User-agent: *\nDisallow: /b\xc3\xa9/\n", AGENT,
                          "/bé/z") is False  # bytes + UTF-8


def test_rules_before_any_group_are_ignored():
    body = "Disallow: /x/\nUser-agent: *\nDisallow: /y/\n"
    assert robots_allowed(body, AGENT, "/x/1") is True
    assert robots_allowed(body, AGENT, "/y/1") is False


def test_pattern_to_regex_escapes_java_safely():
    rx = pattern_to_regex("/a+b(c)/*.pdf$")
    import re

    assert re.search(rx, "/a+b(c)/zz.pdf")
    assert not re.search(rx, "/a+b(c)/zz.pdfX")


def test_compile_sorted_by_precedence():
    body = "User-agent: *\nDisallow: /p/\nAllow: /p/q/\nDisallow: /p/q/\n"
    rules = compile_robots(body, AGENT)
    # (plen DESC, allow first on equal plen)
    assert [(a, n) for a, n, _ in rules] == [(True, 5), (False, 5), (False, 3)]


def test_robots_gate_matches_kernel_and_keeps_pages_jvm_only(spark):
    from pyspark.sql import functions as F

    from doctor_spark.operators.robots import robots_gate

    bodies = {
        "a.test": "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n",
        "b.test": "User-agent: trainingbot\nDisallow: /no-train/\n"
                  "User-agent: *\nDisallow: /\n",
    }
    pages = spark.createDataFrame(
        [(f"https://{h}{p}",) for h in ("a.test", "b.test", "c.test")
         for p in ("/private/x", "/private/public/x", "/no-train/x", "", "/ok?q=1")],
        "url string",
    )
    robots = spark.createDataFrame(
        list(bodies.items()), "host string, robots_body string"
    )
    out = robots_gate(pages, robots, agent="trainingbot/1.0")
    got = {(r["host"], r["path"]): r["allowed"] for r in out.collect()}
    assert len(got) == 15
    for (h, p), allowed in got.items():
        expected = True if h == "c.test" else None
        if expected is None:
            from doctor_spark.kernels.robots import robots_allowed as ra

            expected = ra(bodies[h], "trainingbot/1.0", p)
        assert allowed == expected, (h, p, allowed, expected)
    # '' path normalized to '/', query string not matched
    assert ("a.test", "/") in got and ("a.test", "/ok") in got

    # scale contract: exactly ONE Python stage (the per-host compile);
    # the per-page verdict is JVM aggregate+RLIKE
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("EvalPython") == 1, final


def test_crawl_delay_group_selection_and_parsing():
    from doctor_spark.kernels.robots import crawl_delay_ms

    body = (
        "User-agent: trainingbot\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x/\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
    )
    # specific group excludes the '*' delay too
    assert crawl_delay_ms(body, AGENT) == 2500
    assert crawl_delay_ms(body, "otherbot") == 10000
    assert crawl_delay_ms("User-agent: *\nDisallow: /\n", AGENT) is None
    assert crawl_delay_ms(None, AGENT) is None
    # junk / negative values ignored; merged same-token groups take max
    assert crawl_delay_ms(
        "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -4\n", AGENT
    ) is None
    assert crawl_delay_ms(
        "User-agent: a\nCrawl-delay: 1\nUser-agent: a\nCrawl-delay: 3\n",
        "a-bot",
    ) == 3000


def test_robots_crawl_delays_operator(spark):
    from doctor_spark.operators.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nCrawl-delay: 1.5\n"),
            ("b.test", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_body string",
    )
    got = {
        r["host"]: r["crawl_delay_ms"]
        for r in robots_crawl_delays(robots, AGENT).collect()
    }
    assert got == {"a.test": 1500, "b.test": None}


def test_url_admission_fused_plan_zero_corpus_shuffle(spark):
    """The fused admission recipe (blocklist -> robots) must keep the
    page side shuffle-free: both dimensions broadcast; the only hash
    exchange allowed is the blocklist's own dedup."""
    import re

    import __spark_entry__ as entry

    out = entry.queries()["url_admission"](spark, "/root/testdata/sf0.001")
    assert out.count() == 500
    final = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final
    keyed = re.findall(r"Exchange hashpartitioning\((\w+)", final)
    assert all(k.startswith("_bl") for k in keyed), final


def test_robots_from_warc_pages_end_to_end(spark, tmp_path):
    """Common-Crawl shape: /robots.txt fetches ride in the same WARC as
    the pages they govern.  The dimension builder must pick the LATEST
    snapshot per host (max (warc_ts, url)), pass bytes through to the
    compile kernel, and gate pages end-to-end."""
    import datetime as dt

    from doctor_spark.operators.robots import robots_from_pages, robots_gate
    from doctor_spark.sources.warc import build_warc, read_warc_pages

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    recs = [
        # stale snapshot blocks everything; the later one only /no-train/
        {"url": "https://a.test/robots.txt", "warc_ts": t0,
         "html": b"User-agent: *\nDisallow: /\n"},
        {"url": "http://a.test/robots.txt", "warc_ts": t1,
         "html": b"User-agent: *\nDisallow: /no-train/\n"},
        {"url": "https://a.test/no-train/x", "warc_ts": t1, "html": b"<p>x</p>"},
        {"url": "https://a.test/keep", "warc_ts": t1, "html": b"<p>y</p>"},
        # robots.txt with a query string still counts; no-robots host
        {"url": "https://b.test/robots.txt?v=1", "warc_ts": t0,
         "html": b"User-agent: *\nDisallow: /b/\n"},
        {"url": "https://b.test/b/1", "warc_ts": t0, "html": b"<p>z</p>"},
        {"url": "https://c.test/anything", "warc_ts": t0, "html": b"<p>c</p>"},
    ]
    (tmp_path / "crawl.warc").write_bytes(build_warc(recs))
    pages = read_warc_pages(spark, str(tmp_path / "crawl.warc"))
    robots = robots_from_pages(pages)
    got_dim = {r["host"]: bytes(r["robots_body"]) for r in robots.collect()}
    assert got_dim == {
        "a.test": b"User-agent: *\nDisallow: /no-train/\n",
        "b.test": b"User-agent: *\nDisallow: /b/\n",
    }

    content = pages.where(~pages.url.rlike(r"/robots\.txt")) \
        .select("url")
    out = robots_gate(content, robots, agent="trainingbot/1.0")
    verdicts = {r["url"]: r["allowed"] for r in out.collect()}
    assert verdicts == {
        "https://a.test/no-train/x": False,
        "https://a.test/keep": True,
        "https://b.test/b/1": False,
        "https://c.test/anything": True,
    }
