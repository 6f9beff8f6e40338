"""Web-date normalization — the typed cast downstream of the metadata /
sitemap / feed ingests (their ``published_at`` / ``lastmod`` /
``published`` fields are raw strings by contract; this stage folds the
wild formats into one canonical UTC date).

Pure Column expressions — JVM-side, whole-stage codegen, zero Python.
``try_to_timestamp`` keeps malformed input NULL instead of failing the
task under ANSI mode (Spark 4 default).  The session timezone is UTC
(doctor_spark.session pins ``spark.sql.session.timeZone``), so
offset-carrying inputs normalize to the correct UTC calendar date.

Formats, first match wins (the order big feed consumers use):

1. ISO 8601 with offset — ``2026-08-19T01:30:00+05:30`` / ``…Z``
   (sitemaps.org lastmod, Atom published/updated, OpenGraph);
2. ISO 8601 without offset — ``2026-08-19T06:30:00`` (treated as UTC);
3. RFC 1123 — ``Tue, 18 Aug 2026 23:59:59 GMT`` (RSS pubDate,
   HTTP Last-Modified);
4. slash date — ``2026/08/07``;
5. bare date — ``2026-08-19``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd",
    "yyyy-MM-dd",
)


def parse_web_timestamp(col: Column) -> Column:
    """Raw web date string → typed timestamp (UTC semantics under the
    pinned session timezone), NULL when no format matches."""
    trimmed = F.trim(col)
    # RFC 1123: Spark ≥3 bans day-name patterns (EEE) in the parser, so
    # the weekday prefix is stripped structurally instead — the day name
    # is redundant with the date and wild feeds get it wrong anyway.
    rfc = F.regexp_replace(trimmed, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        *[F.try_to_timestamp(trimmed, F.lit(f)) for f in _FORMATS],
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss zzz")),
    )


def parse_web_date(col: Column) -> Column:
    """Raw web date string → canonical ``yyyy-MM-dd`` UTC date string
    (offset inputs roll to the UTC calendar day), NULL when unparseable."""
    return F.date_format(parse_web_timestamp(col), "yyyy-MM-dd")
