"""Mirror-site detection — host pairs serving the same content.

Web crawls are full of mirrors: software-archive replicas, syndicated
article networks, parked-domain farms, ccTLD clones of the same site.
A training-data pipeline wants them BEFORE document-level dedup — a
host-pair overlap table lets curation drop (or downweight) the whole
mirror at admission time instead of paying near-dup compute per page.
This operator computes, per host pair, how many distinct content
fingerprints they share, sized against both hosts, as an integer
overlap fraction.

Scale discipline (the 10^12-row shape):

- ONE (host, fp) distinct exchange; per-host sizes fold off it with a
  map-side-combined keyed count.
- Pair expansion happens per FINGERPRINT on the host list collected for
  that fingerprint — and is bounded by ``host_cap`` FIRST: a
  fingerprint carried by more hosts than the cap is chrome/boilerplate
  (a footer served by 10^5 sites), not mirror signal, and would
  otherwise fan out quadratically.  Real mirror clusters are small
  (a handful of replicas), so the cap keeps every true pair while the
  hot fingerprints — the skew — never materialize a single pair row.
  The drop is by-construction visible: capped fingerprints still count
  in host sizes, so the denominator is honest.
- Pairs expand JVM-side (nested ``transform`` over the sorted host
  array — the repo's bitext idiom, no self-join), then ONE keyed
  (host1, host2) count.
- Host sizes attach via keyed joins on the host-pair aggregate (both
  sides are host-dimension-sized; AQE may broadcast when tiny, which
  is the right adaptive call, and splits mega-pair skew when not).

``overlap_micro`` = ``n_shared * 1e6 DIV min(n1, n2)`` — pure int64
arithmetic, exact in any engine, 1_000_000 = full containment of the
smaller host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_mirror_pairs(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    host_cap: int = 16,
    min_shared: int = 1,
) -> DataFrame:
    """``(host1, host2, n_shared, n1, n2, overlap_micro)`` — one row
    per unordered host pair (host1 < host2) sharing ``>= min_shared``
    distinct content fingerprints, where no shared fingerprint is
    carried by more than ``host_cap`` hosts (boilerplate guard)."""
    base = docs.where(
        F.col(text_col).isNotNull()
        & (F.length(F.trim(F.col(text_col))) > 0)
    )
    hf = base.select(
        F.col(host_col).alias("host"),
        F.md5(F.col(text_col)).alias("fp"),
    ).distinct()
    sizes = hf.groupBy("host").agg(F.count("*").alias("n"))
    groups = (
        hf.groupBy("fp")
        .agg(F.sort_array(F.collect_set("host")).alias("hs"))
        .where((F.size("hs") >= 2) & (F.size("hs") <= host_cap))
    )
    n = F.size("hs")
    pairs = F.flatten(
        F.transform(
            F.col("hs"),
            lambda a, i: F.transform(
                F.slice(F.col("hs"), i + 2, n - i - 1),
                lambda b: F.struct(a.alias("host1"), b.alias("host2")),
            ),
        )
    )
    agg = (
        groups.select(F.explode(pairs).alias("p"))
        .select("p.host1", "p.host2")
        .groupBy("host1", "host2")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        agg.join(
            sizes.select(F.col("host").alias("host1"),
                         F.col("n").alias("n1")),
            "host1",
        )
        .join(
            sizes.select(F.col("host").alias("host2"),
                         F.col("n").alias("n2")),
            "host2",
        )
        .select(
            "host1",
            "host2",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.expr(
                "CAST(n_shared * 1000000L DIV least(n1, n2) AS BIGINT)"
            ).alias("overlap_micro"),
        )
    )
