"""From-scratch WARC (Web ARChive, ISO 28500) source.

Common-Crawl ships pages as ``.warc``/``.warc.gz`` files; this module turns
them into the engine's pages table ``(url, warc_ts, html)`` with a
stdlib-only parser:

- record grammar: ``WARC/1.x`` version line, CRLF headers,
  ``Content-Length`` payload, blank-line separators;
- ``response`` records carry an HTTP response as payload — the HTTP status
  line + headers are stripped to yield the raw body bytes;
- ``.warc.gz`` is per-record gzip members (the CC convention) — handled by
  a multi-member zlib loop.

Scale model: one WARC file = one unit of parallelism (CC files are ~1 GB,
so a 100 TB crawl is ~100k files — ample).  The Spark reader uses the
built-in ``binaryFile`` source, so file listing/distribution is Catalyst's
problem, and record parsing is an Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib

CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout).

    Poison-tolerant: a truncated/garbage member (or trailing junk after
    the last member) ends decompression with whatever decoded cleanly —
    one bad record must not abort a whole-file ingest task."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
    return headers


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a response payload."""
    sep = payload.find(CRLF + CRLF)
    if sep == -1 or not payload[:5] in (b"HTTP/",):
        return payload
    return payload[sep + 4 :]


def parse_warc(data: bytes) -> list[dict]:
    """All ``response`` records of a WARC file →
    ``[{url, warc_ts, html}]``.  Tolerant: malformed records are skipped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        head_end = data.find(CRLF + CRLF, start)
        if head_end == -1:
            break
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        except ValueError:
            ts = None
        records.append({"url": url, "warc_ts": ts, "html": _http_body(payload)})
    return records


def build_warc(
    records: list[dict], *, gzip_per_record: bool = False
) -> bytes:
    """Fixture writer: serialize ``[{url, warc_ts, html}]`` into a WARC
    file (optionally per-record-gzipped, the .warc.gz convention)."""
    out = bytearray()
    for i, rec in enumerate(records):
        body: bytes = rec["html"]
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html" + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF + body
        )
        ts = rec["warc_ts"]
        ts_s = (
            ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            if ts is not None
            else "2024-01-01T00:00:00Z"
        )
        head = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + b"WARC-Record-ID: <urn:uuid:rec-" + str(i).encode() + b">" + CRLF
            + b"WARC-Target-URI: " + rec["url"].encode() + CRLF
            + b"WARC-Date: " + ts_s.encode() + CRLF
            + b"Content-Type: application/http; msgtype=response" + CRLF
            + b"Content-Length: " + str(len(http)).encode() + CRLF
            + CRLF
        )
        record = head + http + CRLF + CRLF
        if gzip_per_record:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out += buf.getvalue()
        else:
            out += record
    return bytes(out)


PAGES_FROM_WARC_DDL = "url string, warc_ts timestamp, html binary"


def read_warc_pages(spark, path: str):
    """Distributed WARC ingest: ``binaryFile`` scan → per-file record parse
    in an Arrow-batched UDF → pages(url, warc_ts, html)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in parse_warc(bytes(blob)):
                    ts = rec["warc_ts"]
                    if ts is not None and ts.tzinfo is not None:
                        # normalize to UTC before dropping tzinfo — a
                        # WARC-Date with a +02:00 offset must not land
                        # shifted relative to Z-suffixed records
                        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": ts,
                            "html": rec["html"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    return files.mapInPandas(parse, schema=PAGES_FROM_WARC_DDL)


# ---------------------------------------------------------------- WET
# Common Crawl's extracted-text distribution format: one WARC
# "conversion" record per page, text/plain payload.  Serialization is
# PURE Column expressions (JVM codegen, zero Python in the hot path);
# the record id is derived from md5(url) so output is deterministic and
# the DuckDB oracle can replay every byte.


def wet_record(url, date_s, text):
    """``(url, 'YYYY-MM-DDTHH:MM:SSZ' string, text)`` Columns → the
    complete WET conversion record as a BINARY Column.

    Layout (fixed header order, CRLF line ends, ``Content-Length`` in
    UTF-8 BYTES of the text payload, two trailing CRLFs)::

        WARC/1.0
        WARC-Type: conversion
        WARC-Target-URI: <url>
        WARC-Date: <date>
        WARC-Record-ID: <urn:uuid:md5(url) as 8-4-4-4-12>
        Content-Type: text/plain
        Content-Length: <octet_length(text)>

        <text>
    """
    from pyspark.sql import functions as F

    h = F.md5(url)
    rid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return F.encode(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
            url,
            F.lit("\r\nWARC-Date: "),
            date_s,
            F.lit("\r\nWARC-Record-ID: <urn:uuid:"),
            rid,
            F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
            F.octet_length(text).cast("string"),
            F.lit("\r\n\r\n"),
            text,
            F.lit("\r\n\r\n"),
        ),
        "utf-8",
    )


def parse_wet(data: bytes) -> list[dict]:
    """WET bytes → ``[{url, date, text}]`` — the sequential twin of
    :func:`wet_record` for round-trip verification; Content-Length
    framed, poison-tolerant (a malformed header block skips to the next
    version line instead of raising)."""
    recs: list[dict] = []
    pos = 0
    while True:
        idx = data.find(b"WARC/1.", pos)
        if idx < 0:
            break
        hdr_end = data.find(CRLF + CRLF, idx)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[idx:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        recs.append(
            {
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "text": body.decode("utf-8", "replace"),
            }
        )
        pos = hdr_end + 4 + clen
    return recs


def wet_partition_files(records: DataFrame, record_col: str = "wet_record"):
    """Concatenate WET records into one file blob per partition —
    ``(n_records, wet_file binary)`` rows, the shape a 100k-file WET
    distribution writes (one ~1 GB member per task, like CC's own
    layout).  Per-partition accumulation is genuine imperative logic
    (Arrow hands a partition as SEVERAL batches), so this is the
    documented mapInPandas last resort; everything upstream stays
    codegen."""
    import pandas as pd

    def concat(batches):
        n, chunks = 0, []
        for pdf in batches:
            for blob in pdf[record_col]:
                chunks.append(bytes(blob))
                n += 1
        if n:
            yield pd.DataFrame(
                {"n_records": [n], "wet_file": [b"".join(chunks)]}
            )

    return records.mapInPandas(
        concat, schema="n_records long, wet_file binary"
    )


def wat_record(url, date_s, payload_json):
    """``(url, date string, JSON payload string)`` Columns → a complete
    WAT metadata record as a BINARY Column (Common Crawl's WAT
    distribution: one ``WARC-Type: metadata`` record per page whose
    body is a JSON envelope of extracted page metadata).

    Same byte discipline as :func:`wet_record` — fixed header order,
    CRLF line ends, ``Content-Length`` in UTF-8 octets of the payload,
    two trailing CRLFs; the record id is the md5 of ``url || '#wat'``
    so WET and WAT records for one page never collide."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(url, F.lit("#wat")))
    rid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return F.encode(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
            url,
            F.lit("\r\nWARC-Date: "),
            date_s,
            F.lit("\r\nWARC-Record-ID: <urn:uuid:"),
            rid,
            F.lit(">\r\nContent-Type: application/json\r\nContent-Length: "),
            F.octet_length(payload_json).cast("string"),
            F.lit("\r\n\r\n"),
            payload_json,
            F.lit("\r\n\r\n"),
        ),
        "utf-8",
    )


def revisit_record(url, date_s, digest, refers_url, refers_date):
    """``(url, date string, payload digest, original url, original date
    string)`` Columns → a complete WARC *revisit* record as a BINARY
    Column — the capture-time dedup artifact (Common Crawl and every
    Heritrix-lineage crawler write one instead of re-storing an
    identical payload; WARC 1.1 §6.7.2 identical-payload-digest
    profile).

    Same byte discipline as :func:`wet_record` — fixed header order,
    CRLF line ends, empty body (``Content-Length: 0``), two trailing
    CRLFs.  The record id is the md5 of ``url || '#' || date ||
    '#revisit'``: unique per CAPTURE (the same URI revisited on two
    dates is two records), never colliding with the page's WET/WAT
    ids."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(url, F.lit("#"), date_s, F.lit("#revisit")))
    rid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return F.encode(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: "),
            url,
            F.lit("\r\nWARC-Date: "),
            date_s,
            F.lit("\r\nWARC-Record-ID: <urn:uuid:"),
            rid,
            F.lit(">\r\nWARC-Refers-To-Target-URI: "),
            refers_url,
            F.lit("\r\nWARC-Refers-To-Date: "),
            refers_date,
            F.lit("\r\nWARC-Payload-Digest: md5:"),
            digest,
            F.lit(
                "\r\nWARC-Profile: http://netpreserve.org/warc/1.1/"
                "revisit/identical-payload-digest"
                "\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
            ),
        ),
        "utf-8",
    )
