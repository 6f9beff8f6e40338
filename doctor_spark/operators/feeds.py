"""Feed ingest operator — fetched RSS/Atom documents → frontier rows.

Same shape as :mod:`.sitemaps`: one Arrow batch per partition parses
every document (kernel: :mod:`..kernels.feeds`) and explodes to one row
per entry ``(kind, title, link, published)``; non-feed / undecodable
documents contribute no rows.  Map-only — scan → ArrowEvalPython →
Generate → project.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_ENTRY_TYPE = (
    "array<struct<kind:string, title:string, link:string, published:string>>"
)


def _entries_udf():
    @F.pandas_udf(_ENTRY_TYPE)
    def entries(body: pd.Series) -> pd.Series:
        from ..kernels.feeds import parse_feed

        def one(b):
            kind, ents = parse_feed(b)
            return [
                {
                    "kind": kind,
                    "title": e["title"],
                    "link": e["link"],
                    "published": e["published"],
                }
                for e in ents
            ]

        return body.map(one)

    return entries


def feed_entries(docs: DataFrame, body_col: str = "html") -> DataFrame:
    """Frontier rows from fetched feed documents: carried columns plus
    ``(kind, title, link, published)`` — ``kind`` is ``rss``/``atom``;
    ``published`` is the raw first-of pubDate/published/updated/date
    string (typed parsing downstream)."""
    carried = [c for c in docs.columns if c != body_col]
    return docs.select(
        *carried, F.explode(_entries_udf()(F.col(body_col))).alias("_e")
    ).select(*carried, "_e.kind", "_e.title", "_e.link", "_e.published")
