"""Sequence packing: map documents to positions in the concatenated
training stream.

GPT-style training concatenates documents (per source stream, in a
deterministic order) and slices the token stream into fixed-length
sequences; a document can span a sequence boundary.  The question a
data pipeline must answer exactly — for lineage, decontamination and
reproducibility — is *which sequences does each document land in*.

That mapping is a prefix sum: ``start_offset = Σ tokens of earlier
docs``, first sequence = ``start_offset div L``, last sequence =
``(end_offset - 1) div L``.  Expressed as ONE window cumulative sum per
source stream — a single keyed exchange; each source's stream packs
independently and in parallel.

Scale note: one gigantic source funnels through one partition (windows
don't split a partition key).  Real pipelines shard such a source into
``source#k`` sub-streams first (any deterministic doc→shard map works,
each shard packs independently) — the operator takes the stream column
as-is so the caller owns that choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    stream_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds the training-stream placement of every document:

    - ``n_tokens``     — whitespace token count (0 for blank docs)
    - ``start_offset`` — tokens before this doc in its stream
    - ``seq_first`` / ``seq_last`` — 0-based sequence ids touched
      (NULL for zero-token docs: they occupy no sequence)
    - ``n_seqs``       — sequences this doc spans

    Deterministic: stream order is ``(stream_col, order_col)``; same
    input → same packing on any cluster.  NULL-text documents count as
    zero tokens and pass through (lineage keeps every row)."""
    from pyspark.sql import Window

    n_tok = F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", n_tok).withColumn(
        "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    end_m1 = F.col("start_offset") + F.col("n_tokens") - 1
    seq_first = F.when(
        F.col("n_tokens") > 0, F.floor(F.col("start_offset") / seq_len)
    )
    seq_last = F.when(F.col("n_tokens") > 0, F.floor(end_m1 / seq_len))
    return (
        out.withColumn("seq_first", seq_first)
        .withColumn("seq_last", seq_last)
        .withColumn(
            "n_seqs",
            F.coalesce(
                F.col("seq_last") - F.col("seq_first") + 1, F.lit(0)
            ).cast("long"),
        )
    )
