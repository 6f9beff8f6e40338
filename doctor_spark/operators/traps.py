"""Crawler-trap detection — the URL-space pathology gate of a crawl
pipeline.

Crawlers burn fetch budget on *trap* URL spaces: calendar archives that
enumerate every day of every year, path cycles (``/forum/thread/forum/
thread/...``), session-id URLs that mint a fresh address per visit, and
parameter explosions.  Heritrix/Nutch/StormCrawler all ship per-URL
heuristics plus a per-host rollup that quarantines hosts whose URL space
is mostly trap-shaped; this module is that stage over a crawl-log table
(reference scope: doctor has no crawler, so this is a training-
data-pipeline extension, same family as operators/robots.py and
operators/scheduler.py).

Scale shape: the per-URL signals are pure codegen'd Column expressions
(regexp + array algebra — zero Python, zero shuffles, whole-stage
codegen), and the host rollup is ONE map-side-combined keyed sum on
``host``.  At 10^12 URLs this is a map stage plus a single exchange on
a key whose cardinality is the host count — the cheapest aggregation
shape Spark has.

Every rule is deliberately expressible in BOTH Spark SQL and DuckDB
(the Java∩RE2 regex discipline used repo-wide), so the driver oracle
replays the full computation rather than pinned literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from doctor_spark.functions.urls import url_host, url_path

# /YYYY/MM/DD/ (or /YYYY/MM/DD at end-of-path) — the calendar-archive
# shape.  [0-9]{4}/[0-9]{1,2}/[0-9]{1,2} is Java∩RE2-safe.
CALENDAR_RE = r"/[0-9]{4}/[0-9]{1,2}/[0-9]{1,2}(/|$)"

# Session-id minting: a known session param name followed by >=8 hex
# chars, in the query string ('?'/'&' delimited) or the ;jsessionid=
# path-parameter form.  Lowercase only — callers lowercase the URL.
SESSION_RE = (
    r"([?&](jsessionid|phpsessid|sessionid|sid)=[0-9a-f]{8,}"
    r"|;jsessionid=[0-9a-f]{8,})"
)

# Trap thresholds (Heritrix's defaults are in the same range: path
# depth ~ >= 8, repeated segments >= 2).
DEEP_PATH = 8
REPEAT_EXCESS = 2
CALENDAR_MIN_DEPTH = 4
PARAM_EXPLOSION = 6


def _segments(path: Column) -> Column:
    """Non-empty path segments (leading/trailing '/' yield empties in
    both engines' split; filter them explicitly so the two agree)."""
    return F.filter(F.split(path, "/"), lambda s: s != "")


def url_trap_signals(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-URL trap signals appended to ``pages``:

    - ``host``            lowercased authority
    - ``depth``           count of non-empty path segments
    - ``repeat_excess``   depth − distinct-segment count (path cycles)
    - ``has_calendar``    /YYYY/MM/DD archive shape in the path
    - ``n_params``        query-parameter count (tracking params kept —
                          a trap gate must see the raw explosion)
    - ``has_session``     session-id minting param
    - ``is_trap``         the disjunction under the module thresholds
    """
    u = F.lower(F.col(url_col))
    path = url_path(u)
    segs = _segments(path)
    depth = F.size(segs).cast("int")
    repeat_excess = (F.size(segs) - F.size(F.array_distinct(segs))).cast(
        "int"
    )
    has_calendar = path.rlike(CALENDAR_RE)
    q = F.regexp_extract(F.split_part(u, F.lit("#"), F.lit(1)), r"\?(.*)$", 1)
    n_params = F.size(F.filter(F.split(q, "&"), lambda p: p != "")).cast(
        "int"
    )
    has_session = u.rlike(SESSION_RE)
    is_trap = (
        (depth >= DEEP_PATH)
        | (repeat_excess >= REPEAT_EXCESS)
        | (has_calendar & (depth >= CALENDAR_MIN_DEPTH))
        | has_session
        | (n_params >= PARAM_EXPLOSION)
    )
    return pages.select(
        "*",
        url_host(u).alias("host"),
        depth.alias("depth"),
        repeat_excess.alias("repeat_excess"),
        has_calendar.alias("has_calendar"),
        n_params.alias("n_params"),
        has_session.alias("has_session"),
        is_trap.alias("is_trap"),
    )


def host_trap_table(
    pages: DataFrame,
    url_col: str = "url",
    flag_trap_micro: int = 500_000,
) -> DataFrame:
    """Per-host trap rollup: URL counts, per-signal counts, the trap
    fraction as int64 micros, and the quarantine flag (``trap_micro >=
    flag_trap_micro``, default: half the host's URLs are trap-shaped).

    ONE keyed exchange on ``host``; everything upstream is codegen.
    """
    sigs = url_trap_signals(pages, url_col)
    b = lambda c: F.sum(F.col(c).cast("bigint"))  # noqa: E731
    return (
        sigs.where(F.col("host").isNotNull())
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            b("is_trap").alias("n_trap"),
            F.sum((F.col("depth") >= DEEP_PATH).cast("bigint")).alias(
                "n_deep"
            ),
            F.sum(
                (F.col("repeat_excess") >= REPEAT_EXCESS).cast("bigint")
            ).alias("n_repeat"),
            F.sum(
                (
                    F.col("has_calendar")
                    & (F.col("depth") >= CALENDAR_MIN_DEPTH)
                ).cast("bigint")
            ).alias("n_calendar"),
            b("has_session").alias("n_session"),
            F.sum(
                (F.col("n_params") >= PARAM_EXPLOSION).cast("bigint")
            ).alias("n_paramexp"),
        )
        .select(
            "host",
            "n_urls",
            "n_trap",
            "n_deep",
            "n_repeat",
            "n_calendar",
            "n_session",
            "n_paramexp",
            F.expr("CAST(n_trap * 1000000L DIV n_urls AS BIGINT)").alias(
                "trap_micro"
            ),
            (
                F.expr("n_trap * 1000000L DIV n_urls")
                >= F.lit(flag_trap_micro)
            ).alias("flagged"),
        )
    )
