"""Politeness-aware fetch scheduling — the step between frontier
admission (robots/blocklist gates) and the fetch itself.

A crawler must serialize requests per host (one connection, one
crawl-delay clock) while drawing parallelism from host COUNT.  This
operator turns an admitted frontier into per-worker fetch queues:

- ``worker``: an engine-portable md5 band of the host (the
  sampling.py discipline — same host → same worker on any cluster
  size, any engine, any retry), so a host's urls never split across
  workers and politeness is structural, not cooperative;
- ``seq``: the host-local queue position by ``(priority DESC, url
  ASC)`` — deterministic total order;
- ``fetch_at_sec``: ``seq × crawl_delay_sec`` — the earliest slot the
  RFC 9309 delay allows (the robots operator supplies the delay).

Scale shape: ONE keyed exchange (the host window); worker assignment
is pure codegen.  ``per_host_cap`` bounds the hot-host skew the way
real schedulers do — a host gets at most N slots per cycle, the tail
re-enters the next frontier — and Spark pushes the capped rank down
as WindowGroupLimit (a bounded per-key heap on the map side), so a
CDN host with 10^8 admitted urls costs a top-N, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fetch_schedule(
    frontier: DataFrame,
    k_workers: int = 64,
    per_host_cap: int | None = None,
    salt: str = "",
) -> DataFrame:
    """``(url, host, priority, crawl_delay_sec)`` frontier rows →
    ``(url, host, worker, seq, fetch_at_sec)`` fetch queues."""
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url").asc()
    )
    out = frontier.withColumn("rn", F.row_number().over(w))
    if per_host_cap is not None:
        out = out.where(F.col("rn") <= per_host_cap)
    worker = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("host"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % k_workers
    )
    return out.select(
        "url",
        "host",
        worker.alias("worker"),
        (F.col("rn") - 1).cast("long").alias("seq"),
        ((F.col("rn") - 1) * F.col("crawl_delay_sec"))
        .cast("long")
        .alias("fetch_at_sec"),
    )
