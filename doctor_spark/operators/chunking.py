"""Chunking operator — documents → boundary-aware chunk table.

Same shape as the table/heading/code-block ingests: one Arrow batch
per partition (kernel: :mod:`..kernels.chunking`), explode to one row
per chunk ``(chunk_idx, n_tokens, kind, chunk_text)``.  Map-only,
zero shuffles at any scale — chunking is embarrassingly parallel per
document; downstream packing (operators/packing.py) or embedding
stages group the chunks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_CHUNKS_TYPE = (
    "array<struct<chunk_idx:int, n_tokens:int, kind:string, "
    "chunk_text:string>>"
)


def _chunks_udf(max_tokens: int):
    @F.pandas_udf(_CHUNKS_TYPE)
    def chunks(texts: pd.Series) -> pd.Series:
        from ..kernels.chunking import chunk_text

        return pd.Series(
            [
                [
                    {
                        "chunk_idx": i, "n_tokens": n,
                        "kind": k, "chunk_text": t,
                    }
                    for i, n, k, t in chunk_text(x, max_tokens)
                ]
                for x in texts
            ]
        )

    return chunks


def chunk_documents(
    docs: DataFrame, text_col: str = "text", max_tokens: int = 256
) -> DataFrame:
    """Carried columns plus ``(chunk_idx, n_tokens, kind, chunk_text)``
    — one row per chunk in document order; blank/NULL documents
    produce no rows."""
    carried = [c for c in docs.columns if c != text_col]
    udf = _chunks_udf(max_tokens).asNondeterministic()
    return docs.select(
        *carried,
        F.explode(udf(F.col(text_col))).alias("_c"),
    ).select(
        *carried,
        "_c.chunk_idx", "_c.n_tokens", "_c.kind", "_c.chunk_text",
    )
