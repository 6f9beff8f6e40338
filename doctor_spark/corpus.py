"""Deterministic synthetic Common-Crawl-style pages corpus (seed=42).

Generates the input table from BASELINE.json's ``input_hint``::

    pages(url: string, warc_ts: timestamp, html: binary, text: string,
          lang: string)

``html`` is the raw payload (any format, like the reference's ``file``
field); ``text`` is the expected extracted content — **the golden** — so
byte-identical verification is a join on ``url``.  Every record is a pure
function of ``doc_id`` (no global RNG state), so generation parallelizes
over a ``spark.range`` without coordination and reproduces identically at
any scale or partitioning.

Goldens are constructed from the authoring templates, independently of the
extraction kernels (the corpus e2e test would catch either side lying).

Format mix per 100 ids — chosen to mirror the reference's fixture corpus
(FIXTURES.md) with a web-crawl-like skew towards HTML:

- 00-54  HTML (utf-8 / cp1252 payloads, boilerplate + content)
- 55-64  text-layer PDF (layout grids, 1-3 pages)
- 65-66  mojibake PDF (pdffactory-corrupt, no-'e' gate)
- 67-69  skew-stamp PDF (stamp dropped only in strip-margin flows)
- 70-74  image-only PDF with embedded OCR word table
- 75-84  plain text (cp1252 / utf-8)
- 85-89  DOCX
- 90-93  broken-magic PDF (%PDF not at offset 0)
- 94-95  legacy Word .doc (OLE2 + FIB text run)
- 96     WordPerfect .wpd
- 97-99  binary junk (golden "", err row)

~1 % of HTML ids carry a 100×-length payload (size-skew bucket tests).
"""

from __future__ import annotations

import datetime as dt
import random

from .kernels.docx import build_docx
from .kernels.mojibake import TRANSLATE_TABLE
from .kernels.ocr_assembly import assemble_page_text_plain
from .kernels.pdfwriter import Line, PageSpec, build_pdf, text_to_lines

SEED = 42
# bump whenever a generator change alters payloads or goldens — cache
# directories (bench/scaling materializations) are keyed on it, so stale
# corpora can never be verified against a newer extractor
CORPUS_VERSION = 6
_BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "court order motion filed party record appeal brief rule state claim "
    "judge law case matter right fact question counsel argument trial "
    "district federal opinion statute section under review grant deny "
    "plain text data web page content news story market report title"
).split()

# words containing no 'e' (for mojibake fixtures: the corruption gate is
# "no e in content", so the *decoded* golden must also be e-free) and no
# chars that the mojibake map would round-trip lossily (s maps from '-')
_NO_E_WORDS = (
    "court motion party filing rights claim trial right law fact "
    "war gold third last night found full plain"
).split()

_LANGS = ("en", "en", "en", "fr", "es", "de", "zh")

# inverse mojibake map: plain char -> corrupt char (1-char values only)
_TO_MOJIBAKE = {v: chr(k) for k, v in TRANSLATE_TABLE.items() if len(v) == 1}


def _rng(doc_id: int) -> random.Random:
    return random.Random((doc_id * 2654435761 + SEED) & 0xFFFFFFFF)


def _sentence(r: random.Random, n: int, words=_WORDS) -> str:
    return " ".join(r.choice(words) for _ in range(n))


# -- per-format builders: each returns (payload: bytes, golden: str) --------


def _build_html(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    n_paras = 200 if doc_id % 97 == 0 else r.randint(2, 8)  # ~1% giants
    title = _sentence(r, 4).title()
    paras = [_sentence(r, r.randint(8, 30)) for _ in range(n_paras)]
    use_cp1252 = r.random() < 0.25
    quote_l, quote_r = ("“", "”") if use_cp1252 else ('"', '"')
    body_parts = [f"<h1>{title}</h1>"]
    for i, p in enumerate(paras):
        if i % 5 == 2:
            body_parts.append(f"<p>{quote_l}{p}{quote_r}</p>")
        else:
            body_parts.append(f"<p>{p}</p>")
    body = "\n".join(body_parts)
    payload_str = (
        "<!DOCTYPE html><html><head><title>"
        + title
        + '</title>\n<script src="track.js">var x=1;</script>'
        + "<style>p{margin:0}</style></head>\n"
        + '<body><div class="nav"><a href="/">home</a> <a href="/a">news</a></div>\n'
        + body
        + '\n<img src="logo.png"><form action="/s"><input name="q"></form>'
        + "</body></html>"
    )
    enc = "cp1252" if use_cp1252 else "utf-8"
    payload = payload_str.encode(enc, errors="replace")
    # what the decode ladder yields back (utf-8 first, iso8859-1 second)
    try:
        decoded = payload.decode("utf-8")
    except UnicodeDecodeError:
        decoded = payload.decode("iso8859-1")
    # golden: cleaner drops head/script/style/form subtrees, unwraps
    # html/body/a/img, keeps div/h1/p markup and the bare newline text nodes
    # (slice runs up to "<img", so it keeps the trailing newline before it)
    d_body = _extract_between(decoded, '<div class="nav">', "<img ")
    d_body_clean = (
        d_body.replace('<a href="/">', "")
        .replace('<a href="/a">', "")
        .replace("</a>", "")
    )
    golden = "\n" + d_body_clean
    return payload, golden


def _extract_between(s: str, start: str, end: str) -> str:
    i = s.index(start)
    j = s.index(end, i)
    return s[i:j]


def _pdf_page_golden(text_block: str) -> str:
    """Normalize an authored layout block to what the reader reconstructs:
    trailing spaces stripped per line, leading/trailing blank lines
    dropped."""
    lines = [ln.rstrip() for ln in text_block.split("\n")]
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def _build_text_pdf(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    n_pages = r.randint(1, 3)
    pages, goldens = [], []
    for p in range(n_pages):
        rows = []
        rows.append(_sentence(r, 5).upper())
        rows.append("")
        for _ in range(r.randint(3, 10)):
            indent = " " * r.choice((0, 0, 4, 8))
            rows.append(indent + _sentence(r, r.randint(4, 9)))
        block = "\n".join(rows)
        pages.append(PageSpec(lines=text_to_lines(block)))
        goldens.append(_pdf_page_golden(block))
    return build_pdf(pages), "\f".join(goldens) + "\f"


def _build_mojibake_pdf(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    plain_lines = [
        " ".join(r.choice(_NO_E_WORDS) for _ in range(r.randint(3, 7)))
        for _ in range(r.randint(2, 5))
    ]
    corrupt_lines = [
        "".join(_TO_MOJIBAKE.get(c, c) for c in ln) for ln in plain_lines
    ]
    page = PageSpec(
        lines=[Line(row=i, col=0, text=t) for i, t in enumerate(corrupt_lines)]
    )
    # the flagship pipeline runs with ocr_available=True, and the reference
    # applies the mojibake fix ONLY on the no-OCR branch (tasks.py:217-221);
    # byte-identical therefore means the corrupt text survives.  The repaired
    # text is the golden for the ocr_available=False flow (checked in
    # tests/test_corpus.py::test_mojibake_fixed_on_no_ocr_path).
    golden = "\n".join(corrupt_lines) + "\f"
    return build_pdf([page]), golden


def _build_skew_pdf(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    body = [_sentence(r, 6) for _ in range(3)]
    lines = [Line(row=i, col=0, text=t) for i, t in enumerate(body)]
    lines.append(Line(row=1, col=45, text="FILED", skew=True))
    page = PageSpec(lines=lines)
    # flagship (non-strip) flow keeps the skewed stamp at its column;
    # golden mirrors the reader's overlap rule exactly (layout_page_text):
    # pad to the stamp column if the line is shorter, single separating
    # space if it overruns, nothing if it lands exactly
    if len(body[1]) < 45:
        row1 = body[1] + " " * (45 - len(body[1])) + "FILED"
    elif len(body[1]) > 45:
        row1 = body[1] + " FILED"
    else:
        row1 = body[1] + "FILED"
    golden = "\n".join([body[0], row1, body[2]]) + "\f"
    return build_pdf([page]), golden


def _build_image_pdf(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    words = []
    top = 200
    for line_no in range(1, r.randint(2, 5)):
        left = 700
        for _ in range(r.randint(2, 6)):
            w = r.choice(_WORDS)
            width = 30 * len(w)
            words.append(
                {"text": w, "conf": r.randint(60, 97), "left": left,
                 "top": top, "width": width, "height": 40,
                 "line_num": line_no, "par_num": 1, "block_num": 1}
            )
            left += width + 25
        top += 60
    page = PageSpec(image=(1700, 2200), ocr_words=words)
    golden = assemble_page_text_plain(words)
    return build_pdf([page]), golden


def _build_txt(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    body = "\n".join(_sentence(r, r.randint(6, 14)) for _ in range(r.randint(2, 12)))
    if r.random() < 0.3:
        body = "“" + body + "”"  # cp1252 curly quotes
    payload = body.encode("cp1252")
    return payload, payload.decode("cp1252")


def _build_docx_doc(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    paras = [_sentence(r, r.randint(5, 20)) for _ in range(r.randint(1, 8))]
    # docx2txt semantics: each paragraph is newline-prefixed
    return build_docx(paras), "\n" + "\n".join(paras)


def _build_broken_magic_pdf(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    block = "\n".join(_sentence(r, 6) for _ in range(3))
    pdf = build_pdf([PageSpec(lines=text_to_lines(block))], broken_magic=True)
    return pdf, _pdf_page_golden(block) + "\f"


def _build_msdoc(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    from .kernels.msdoc import build_doc

    text = "\n".join(_sentence(r, r.randint(5, 12)) for _ in range(r.randint(2, 6)))
    return build_doc(text), text


def _build_wpd_doc(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    from .kernels.wpd import build_wpd

    text = "\n".join(_sentence(r, r.randint(4, 10)) for _ in range(r.randint(2, 5)))
    # the WPD path is two-stage like the reference (wpd2html → HTML
    # cleaner, tasks.py:410-433), so the golden is cleaned *markup*: one
    # <p><span>…</span></p> per hard-return line (blank lines → <p></p>),
    # inside lxml-Cleaner's <div> root wrap — mirrored here as a pure
    # formatter so the golden stays an independent function of the text
    paras = "".join(
        f"<p><span>{line}</span></p>\n" if line else "<p></p>\n"
        for line in text.split("\n")
    )
    return build_wpd(text), f"<div>\n\n\n{paras}\n\n</div>"


def _build_junk(doc_id: int, r: random.Random) -> tuple[bytes, str]:
    """Undetectable garbage (the err-row bucket).  The bytes must contain
    NO content-sniff trigger the dispatcher honors: at 11.52M docs a
    1-in-4e5 random blob carried the literal ``PDF`` inside its first 40
    bytes (doc_id 3738399), routed to the pdf parser and produced the
    reference's "Unable to extract" message instead of the bucket's empty
    golden.  A fixed non-magic 8-byte head kills every ``startswith``
    magic (OLE2/PK/WPC/ID3/MP3/PNG/JPEG/TIFF/%PDF), and scrubbing the
    ``PDF`` substring kills both rescue sniffs (``PDF`` in the first 40
    bytes, ``%PDF-x.y`` in the first 1024)."""
    raw = bytes(r.getrandbits(8) for _ in range(r.randint(64, 2048)))
    raw = b"\x01\x9d\x12\x86\x03\x7e\x44\x99" + raw[8:]
    return raw.replace(b"PDF", b"P\x7fF"), ""


# (bucket upper bound, builder, url suffix)
_FORMAT_TABLE = (
    (55, _build_html, "html"),
    (65, _build_text_pdf, "pdf"),
    (67, _build_mojibake_pdf, "pdf"),
    (70, _build_skew_pdf, "pdf"),
    (75, _build_image_pdf, "pdf"),
    (85, _build_txt, "txt"),
    (90, _build_docx_doc, "docx"),
    (94, _build_broken_magic_pdf, "bin"),
    (96, _build_msdoc, "doc"),
    (97, _build_wpd_doc, "wpd"),
    (100, _build_junk, "bin"),
)


def generate_page(doc_id: int) -> dict:
    """One pages-table record, a pure function of doc_id."""
    r = _rng(doc_id)
    bucket = doc_id % 100
    for hi, builder, suffix in _FORMAT_TABLE:
        if bucket < hi:
            payload, golden = builder(doc_id, r)
            break
    category = suffix if suffix != "bin" else "blob"
    url = f"https://example{doc_id % 50}.test/{category}/{doc_id}.{suffix}"
    # ~1-day stride (co-prime with 30 d) so even small corpora span several
    # crawl days — partition-pruning tests need >1 date
    ts = _BASE_TS + dt.timedelta(seconds=(doc_id * 86171) % (30 * 86400))
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": golden,
        "lang": _LANGS[doc_id % len(_LANGS)],
    }


def generate_pages(start: int, count: int) -> list[dict]:
    return [generate_page(i) for i in range(start, start + count)]


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_dataframe(spark, n_docs: int, partitions: int | None = None):
    """Distributed corpus generation: ``spark.range`` → ``mapInPandas``.

    Each task generates its id-slice independently (pure function of id), so
    this scales to any corpus size with zero shuffle or driver memory."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [generate_page(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    )
