"""The extraction operator: ``mapInPandas`` over Arrow batches of pages.

One Arrow batch = many documents; inside the batch we classify-then-parse
with the pure kernels (no Spark imports there), the reference's unit of work
"1 HTTP request" becoming "1 row inside an Arrow batch"
(SURVEY.md §1.2).  Per-document failures emit ``err`` rows — a poison
document can never fail a task (the Spark analog of the reference's
500-with-Sentry path, views.py:151-179).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

RESULT_SCHEMA_DDL = (
    "url string, warc_ts timestamp, lang string, "
    "extension string, mime string, content string, err string, "
    "extracted_by_ocr boolean, page_count int, size_bytes long"
)


def extract_operator(
    df: DataFrame,
    *,
    ocr_available: bool = True,
    strip_margin: bool = False,
    recap_mode: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) → extraction result table.

    The UDF closure captures only plain bools (cheap pickles); kernels are
    imported inside the worker so the Spark plan ships no heavy state.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from doctor_spark.kernels.extract import extract_document

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            urls = pdf["url"].to_numpy()
            payloads = pdf["html"].to_numpy()
            out = {
                "extension": [""] * n, "mime": [""] * n,
                "content": [""] * n, "err": [""] * n,
                "extracted_by_ocr": [False] * n,
                "page_count": [None] * n,
            }
            for i in range(n):
                res = extract_document(
                    urls[i],
                    bytes(payloads[i]) if payloads[i] is not None else b"",
                    ocr_available=ocr_available,
                    strip_margin=strip_margin,
                    recap_mode=recap_mode,
                )
                out["extension"][i] = res.extension
                out["mime"][i] = res.mime
                out["content"][i] = res.content
                out["err"][i] = res.err
                out["extracted_by_ocr"][i] = res.extracted_by_ocr
                out["page_count"][i] = res.page_count
            result = pd.DataFrame(out)
            result.insert(0, "url", pdf["url"].values)
            result.insert(1, "warc_ts", pdf["warc_ts"].values)
            result.insert(2, "lang", pdf["lang"].values)
            result["page_count"] = result["page_count"].astype("Int32")
            result["size_bytes"] = pdf["html"].map(
                lambda b: len(b) if b is not None else 0
            ).astype("int64")
            yield result

    required = ("url", "warc_ts", "lang", "html")
    missing = [c for c in required if c not in df.columns]
    if missing:  # fail fast at plan time, not as a per-task KeyError
        raise ValueError(
            f"extract_operator input is missing columns {missing}; "
            f"expected the pages schema {required}"
        )
    return df.select(*required).mapInPandas(run, schema=RESULT_SCHEMA_DDL)
