"""Sitemap ingest operator — fetched sitemap documents → frontier rows.

One Arrow batch per partition parses every document with
:func:`..kernels.sitemap.parse_sitemap` and explodes to one row per
entry ``(kind, loc, lastmod, changefreq, priority)``; non-sitemap /
undecodable documents contribute no rows.  Map-only (the explode is a
Generate) — at crawl scale the plan is scan → ArrowEvalPython →
Generate → project, same shape as the link/table ingests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_ENTRY_TYPE = (
    "array<struct<kind:string, loc:string, lastmod:string, "
    "changefreq:string, priority:string>>"
)


def _entries_udf():
    @F.pandas_udf(_ENTRY_TYPE)
    def entries(body: pd.Series) -> pd.Series:
        from ..kernels.sitemap import parse_sitemap

        def one(b):
            kind, ents = parse_sitemap(b)
            return [
                {
                    "kind": kind,
                    "loc": e["loc"],
                    "lastmod": e["lastmod"],
                    "changefreq": e["changefreq"],
                    "priority": e["priority"],
                }
                for e in ents
            ]

        return body.map(one)

    return entries


def sitemap_entries(docs: DataFrame, body_col: str = "html") -> DataFrame:
    """Frontier rows from fetched sitemap documents: carried columns plus
    ``(kind, loc, lastmod, changefreq, priority)``.  ``kind`` is
    ``urlset`` / ``sitemapindex`` / ``text`` per the kernel; rows from
    a ``sitemapindex`` are CHILD SITEMAPS to fetch, not pages — the
    caller routes on ``kind``."""
    carried = [c for c in docs.columns if c != body_col]
    return docs.select(
        *carried, F.explode(_entries_udf()(F.col(body_col))).alias("_e")
    ).select(
        *carried, "_e.kind", "_e.loc", "_e.lastmod",
        "_e.changefreq", "_e.priority",
    )
