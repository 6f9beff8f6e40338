"""Remote binary fetch (reference S2) and the URL→PDF assembly chain.

Reference ``download_images`` (doctor/tasks.py:436-458) fans N image
URLs out over an asyncio/executor pool and returns their bodies IN
INPUT ORDER; ``images_to_pdf`` (views.py:370-393) feeds that list to
img2pdf and strips the metadata.  Here the same contract is expressed
Spark-natively:

- ``http_fetch`` — order-preserving concurrent fetch of one URL list
  (the reference's gather semantics) over a pluggable ``transport``
  callable.  The default transport is a real stdlib ``urllib`` GET with
  the reference's 300 s timeout; tests and sandboxed runs inject a
  deterministic fake — the same seam the OCR backend uses for
  tesseract.  Failures yield ``(None, "<error>")`` rather than raising:
  at 10^12-row scale one dead URL must not kill a task.
- ``fetch_binary_column`` — the distributed form: a ``mapInPandas``
  stage that fetches each row's URL with a bounded per-batch thread
  pool.  I/O-bound concurrency belongs INSIDE the Python worker (the
  GIL releases on socket reads); executor-level parallelism multiplies
  it.  No shuffle is introduced — fetch is a map.
- ``images_to_pdf_from_urls`` — the full S2→V1→V3 endpoint chain:
  download, assemble one page per image via the from-scratch writer,
  strip metadata for hashing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame

Transport = Callable[[str], bytes]

_TIMEOUT = 300.0  # the reference's requests timeout (views.py:388)


def urllib_transport(url: str) -> bytes:
    """Real network GET (stdlib only).  Not exercised by the test suite
    — the sandbox has no network — but this is the production default,
    mirroring the reference's ``requests.get``."""
    from urllib.request import urlopen

    with urlopen(url, timeout=_TIMEOUT) as resp:  # noqa: S310
        return resp.read()


def http_fetch(
    urls: list[str],
    transport: Transport = urllib_transport,
    max_workers: int = 16,
) -> list[tuple[bytes | None, str]]:
    """Concurrent order-preserving fetch of one URL list — the
    ``download_images`` contract (tasks.py:436-458).  Returns one
    ``(body, err)`` per url, in input order; a transport failure
    produces ``(None, repr)`` for that url only."""
    if not urls:
        return []

    def one(url: str) -> tuple[bytes | None, str]:
        try:
            return transport(url), ""
        except Exception as exc:  # any transport failure is data, not fatal
            return None, f"{type(exc).__name__}: {exc}"

    with ThreadPoolExecutor(max_workers=min(max_workers, len(urls))) as ex:
        return list(ex.map(one, urls))


def fetch_binary_column(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "payload",
    err_col: str = "fetch_err",
    transport: Transport = urllib_transport,
    max_workers: int = 16,
) -> DataFrame:
    """Distributed fetch: append ``(out_col binary, err_col string)`` to
    every row by GETting its ``url_col``.  Map-only — Arrow batches in,
    a bounded thread pool per batch, no shuffle; scale comes from
    partition count × in-worker concurrency."""
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` binary, `{err_col}` string"
    names = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = http_fetch(
                [str(u) for u in pdf[url_col]], transport, max_workers
            )
            out = pdf[names].copy()
            out[out_col] = [body for body, _ in results]
            out[err_col] = [err for _, err in results]
            yield out

    return df.mapInPandas(run, schema=schema)


def images_to_pdf_from_urls(
    sorted_urls: list[str],
    transport: Transport = urllib_transport,
) -> bytes:
    """The complete ``/convert/images/pdf/`` flow (views.py:370-393):
    download every image body in order, assemble one page per image
    (V1 writer, PNG payloads decoded by the from-scratch codec), and
    strip metadata for deterministic hashing (V3).  Any fetch failure
    fails the whole conversion, like the reference's unguarded
    ``requests.get``."""
    from ..kernels.pdfwrite import (
        PdfWriteError,
        pdf_from_png_bytes,
        strip_pdf_metadata,
    )

    bodies = []
    for body, err in http_fetch(sorted_urls, transport):
        if body is None:
            raise PdfWriteError(f"fetch failed: {err}")
        bodies.append(body)
    return strip_pdf_metadata(pdf_from_png_bytes(bodies))
