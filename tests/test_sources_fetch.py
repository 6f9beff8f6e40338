"""S2 remote fetch (reference tasks.py:436-458, views.py:370-393):
order-preserving concurrent download behind a pluggable transport, its
distributed mapInPandas form, and the URL→PDF assembly chain."""

from __future__ import annotations

import time

import numpy as np
import pytest

from doctor_spark.kernels.pdf import parse_pdf
from doctor_spark.kernels.pdfwrite import PdfWriteError
from doctor_spark.kernels.png import encode_png
from doctor_spark.sources.fetch import (
    fetch_binary_column,
    http_fetch,
    images_to_pdf_from_urls,
)


def _make_png_transport():
    """Deterministic fake transport: the url's trailing integer seeds an
    8×(6+k%5) gray raster.  Returned as a CLOSURE so cloudpickle ships
    it by value — a module-level function in a test file pickles by
    reference, which Spark workers cannot import."""

    def _png_for(url: str) -> bytes:
        import numpy as np

        from doctor_spark.kernels.png import encode_png

        k = int(url.rsplit("/", 1)[-1].split(".")[0])
        arr = ((np.arange(8 * (6 + k % 5)) * (k + 3)) % 256).astype(
            np.uint8
        ).reshape(8, 6 + k % 5)
        return encode_png(arr)

    return _png_for


_png_for = _make_png_transport()


class TestHttpFetch:
    def test_order_preserved_despite_completion_order(self):
        """The reference gathers futures and appends IN INPUT ORDER —
        a slow first URL must not reorder the result."""

        def slow_first(url: str) -> bytes:
            if url.endswith("/0.png"):
                time.sleep(0.15)
            return url.encode()

        urls = [f"http://x/{i}.png" for i in range(6)]
        out = http_fetch(urls, transport=slow_first, max_workers=6)
        assert [b.decode() for b, _ in out] == urls
        assert all(err == "" for _, err in out)

    def test_failure_isolated_per_url(self):
        def flaky(url: str) -> bytes:
            if "3" in url:
                raise OSError("connection refused")
            return b"ok"

        out = http_fetch([f"u{i}" for i in range(5)], transport=flaky)
        assert [b for b, _ in out] == [b"ok", b"ok", b"ok", None, b"ok"]
        assert "OSError" in out[3][1]

    def test_empty(self):
        assert http_fetch([]) == []


class TestFetchBinaryColumn:
    def test_map_only_fetch_appends_payload(self, spark):
        df = spark.range(0, 40).selectExpr(
            "id AS doc_id", "concat('http://img/', id, '.png') AS url"
        )
        got = fetch_binary_column(df, transport=_png_for).orderBy("doc_id")
        rows = got.collect()
        assert len(rows) == 40
        assert got.columns == ["doc_id", "url", "payload", "fetch_err"]
        for r in rows:
            assert bytes(r.payload) == _png_for(r.url) and r.fetch_err == ""

    def test_no_shuffle_in_plan(self, spark):
        df = spark.range(0, 8).selectExpr(
            "concat('http://img/', id, '.png') AS url"
        )
        plan = fetch_binary_column(
            df, transport=_png_for
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_errors_are_rows_not_failures(self, spark):
        def bomb(url: str) -> bytes:
            raise TimeoutError("dead host")

        df = spark.range(0, 3).selectExpr(
            "concat('http://img/', id, '.png') AS url"
        )
        rows = fetch_binary_column(df, transport=bomb).collect()
        assert all(r.payload is None and "TimeoutError" in r.fetch_err
                   for r in rows)


class TestImagesToPdfFromUrls:
    def test_full_chain(self):
        urls = [f"http://img/{i}.png" for i in range(3)]
        pdf = images_to_pdf_from_urls(urls, transport=_png_for)
        doc = parse_pdf(pdf)
        assert doc.page_count == 3
        assert all(len(p.images) == 1 for p in doc.pages)
        # V3 strip ran: deterministic output, fresh two-key info dict
        assert pdf == images_to_pdf_from_urls(urls, transport=_png_for)
        assert b"/CreationDate <>" in pdf

    def test_fetch_failure_fails_conversion(self):
        def bomb(url: str) -> bytes:
            raise OSError("no route")

        with pytest.raises(PdfWriteError, match="fetch failed"):
            images_to_pdf_from_urls(["http://img/1.png"], transport=bomb)
