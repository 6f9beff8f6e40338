"""Exact grouped quantiles for corpus auditing.

``percentile_approx`` / t-digest sketches are the usual Spark answer,
but their results are estimator-dependent — useless for an oracle-
checked contract and surprisingly divergent across engines.  This
module computes EXACT type-1 quantiles (no interpolation: the value at
rank ``ceil(q·n)``) with pure integer rank arithmetic, so any engine
ordering by the same column produces the identical decile table.

100-TB plan: one row_number window per group (the corpus funnels
through one partition PER GROUP — fine for the corpus-audit use where
groups are languages/sources; for a single-group global quantile at
crawl scale, pre-aggregate to (value, count) first, which collapses the
window input to the value domain).  The rank targets come from a
domain-sized count table joined back — one extra tiny exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_deciles(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Deciles q=1..9 of ``value_col`` within each ``group_col``.

    Type-1 (inverse-CDF) definition: the decile q is the value whose
    rank equals ``ceil(q·n/10)`` = ``(q·n + 9) div 10`` in the group's
    ascending order — pure integers, engine-exact, and invariant to tie
    order (tied values at a rank are by definition equal).

    Output: (group, q, n, value)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull())
    w = Window.partitionBy("grp").orderBy("v")
    ranked = base.withColumn("rn", F.row_number().over(w))
    targets = (
        base.groupBy("grp")
        .agg(F.count("*").alias("n"))
        .select(
            "grp",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("q"),
        )
        .withColumn("need", F.expr("(q * n + 9) div 10"))
    )
    return (
        ranked.join(
            targets,
            (ranked["grp"] == targets["grp"]) & (ranked["rn"] == targets["need"]),
        )
        .select(
            ranked["grp"].alias(group_col),
            F.col("q").cast("bigint").alias("q"),
            F.col("n").cast("bigint").alias("n"),
            F.col("v").alias("value"),
        )
    )
