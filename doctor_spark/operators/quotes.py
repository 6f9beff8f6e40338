"""Quotation-span operator — documents → quoted-passage table.

Same shape as the span-lineage/code-block ingests: one Arrow batch per
partition (kernel: :mod:`..kernels.quotes`), explode to one row per
quoted span ``(quote_idx, start_off, end_off, quote_text)``.
Map-only, zero shuffles; the span table joins the dedup /
decontamination machinery downstream (a quote recurring across many
documents is exactly the n-gram the memorization audit hunts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_QUOTES_TYPE = (
    "array<struct<quote_idx:int, start_off:int, end_off:int, "
    "quote_text:string>>"
)


def _quotes_udf(min_tokens: int):
    @F.pandas_udf(_QUOTES_TYPE)
    def quotes(texts: pd.Series) -> pd.Series:
        from ..kernels.quotes import extract_quotes

        return pd.Series(
            [
                [
                    {
                        "quote_idx": i + 1, "start_off": s,
                        "end_off": e, "quote_text": b,
                    }
                    for i, (s, e, b) in enumerate(
                        extract_quotes(x, min_tokens)
                    )
                ]
                for x in texts
            ]
        )

    return quotes


def quote_spans(
    docs: DataFrame, text_col: str = "text", min_tokens: int = 3
) -> DataFrame:
    """Carried columns plus ``(quote_idx, start_off, end_off,
    quote_text)`` — one row per kept quoted span in document order;
    quoteless/blank documents produce no rows."""
    carried = [c for c in docs.columns if c != text_col]
    udf = _quotes_udf(min_tokens).asNondeterministic()
    return docs.select(
        *carried,
        F.explode(udf(F.col(text_col))).alias("_q"),
    ).select(
        *carried,
        "_q.quote_idx", "_q.start_off", "_q.end_off", "_q.quote_text",
    )
