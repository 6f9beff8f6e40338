"""Domain blocklist gate (the UT1 / RefinedWeb "URL filtering" stage).

Web-corpus pipelines drop pages whose host — or ANY parent domain of it —
appears on a curated blocklist (RefinedWeb §3.1 and FineWeb both gate on
the UT1 adult list, ~4M domains).  The matching rule is label-suffix
containment: blocking ``example.com`` blocks ``a.b.example.com`` but NOT
``goodexample.com``.

Scale shape — the part that matters at 10^12 pages:

- the blocklist is a dimension (millions of rows, MBs); the pages table
  is the fact.  A naive "explode every host into its suffix chain, join,
  re-aggregate per url" pays a corpus-wide exchange to undo its own
  explode.  Instead the suffix chain is UNROLLED into ``max_depth``
  depth-indexed broadcast hash probes: probe d joins
  ``substring_index(host, '.', -d)`` (the last ``d`` labels — label-exact
  by construction) against the broadcast list.  Left joins against a
  deduplicated dimension preserve row count, so the whole gate is ONE
  map stage over the corpus — zero shuffles on the page side, no
  explode, no re-aggregation, whole-stage codegen throughout;
- the matched domain reports the MOST SPECIFIC hit (deepest suffix
  first), so list entries like ``bad.h.example`` take precedence over a
  parent ``h.example`` entry;
- everything is JVM Column algebra — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["domain_blocklist_mark"]


def domain_blocklist_mark(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    max_depth: int = 6,
) -> DataFrame:
    """Annotate ``pages`` with ``host``, ``blocked_domain`` (the most
    specific blocklist entry whose labels suffix-match the host, NULL if
    none) and boolean ``blocked``.

    ``max_depth`` bounds the suffix probes: a blocklist entry with more
    than ``max_depth`` labels can never match (UT1-style lists are ≤4
    labels deep; raise the bound if yours are deeper).  The blocklist is
    deduplicated internally so the left probes cannot fan out rows.
    """
    from ..functions.urls import url_host

    bl = blocklist.select(F.col(domain_col).alias("_bl_domain")).dropDuplicates()

    out = pages.withColumn("host", url_host(F.col(url_col))).withColumn(
        "_nlab", F.size(F.split(F.col("host"), r"\."))
    )
    matched = []
    # deepest first: the first non-null in the coalesce is the most
    # specific match
    for d in range(max_depth, 0, -1):
        key = F.when(
            F.col("_nlab") >= d, F.substring_index(F.col("host"), ".", -d)
        )
        bl_d = bl.select(F.col("_bl_domain").alias(f"_bl{d}"))
        out = out.withColumn(f"_sfx{d}", key).join(
            F.broadcast(bl_d), F.col(f"_sfx{d}") == F.col(f"_bl{d}"), "left"
        )
        matched.append(F.col(f"_bl{d}"))
    blocked_domain = F.coalesce(*matched)
    keep = [c for c in pages.columns] + ["host"]
    return out.select(
        *keep,
        blocked_domain.alias("blocked_domain"),
        blocked_domain.isNotNull().alias("blocked"),
    )
