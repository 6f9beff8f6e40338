"""From-scratch DOCX text extraction (stdlib zipfile + ElementTree).

The reference shells out to the Debian ``docx2txt`` CLI (the Perl tool;
doctor/tasks.py:322-334, docker/Dockerfile:15).  That binary is absent
here, and DOCX is a documented zip-of-XML format, so this kernel renders
``word/document.xml`` with the observable semantics of that tool, derived
from the reference's own golden (doctor/tests.py:192-214):

- each ``<w:p>`` paragraph renders as one line, newline-PREFIXED (the
  golden's 200-char window places the first text one char later than an
  appended-newline model allows)
- run-level ``<w:t>`` text is concatenated; run-level ``<w:tab/>`` → TAB;
  ``<w:br/>``/``<w:cr/>`` → newline (tab-STOP definitions under
  ``<w:pPr><w:tabs>`` are layout metadata, not text, and are skipped)
- paragraph justification pads to a 78-column line: ``center`` right-pads
  the text to column ``(78 + len) // 2``; ``right``/``end`` to column 78
  (verified against the golden: the 97-space run is exactly
  1 trailing space + 39 + 39 (two empty centered paragraphs) + 18
  (centering pad of a 41-char heading) at width 78)
- common "smart" punctuation is mapped to ASCII (the golden shows
  ``Applicant's`` where the XML has U+2019)
- field instructions (``fldChar``/``instrText``) and bookmarks are ignored

Malformed zip/XML degrades to an ``err`` record, never an exception.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_LINE_WIDTH = 78

# docx2txt-style fancy-character mapping (subset: the punctuation Word
# inserts automatically; golden requires the U+2019 → "'" entry)
_CHAR_MAP = str.maketrans(
    {
        "‘": "'",
        "’": "'",
        "“": '"',
        "”": '"',
        "–": "-",
        "—": "--",
        "…": "...",
        " ": " ",
        "‑": "-",
    }
)

# subtrees that hold properties/metadata, never document text
_SKIP_TAGS = frozenset(
    {
        _W + "pPr",
        _W + "rPr",
        _W + "sectPr",
        _W + "instrText",
        _W + "delText",
        _W + "fldData",
        _W + "ffData",
    }
)


def _walk_text(el, parts: list[str]) -> None:
    tag = el.tag
    if tag in _SKIP_TAGS:
        return
    if tag == _W + "p":
        # a nested paragraph (text box / AlternateContent) renders as its
        # own line from the document-order iteration in xml2text —
        # descending into it here would extract its text twice
        return
    if tag == _W + "t":
        parts.append(el.text or "")
        return
    if tag == _W + "tab":
        parts.append("\t")
        return
    if tag in (_W + "br", _W + "cr"):
        parts.append("\n")
        return
    for child in el:
        _walk_text(child, parts)


def _render_paragraph(p) -> str:
    parts: list[str] = []
    for child in p:
        _walk_text(child, parts)
    text = "".join(parts).translate(_CHAR_MAP)
    ppr = p.find(_W + "pPr")
    jc = ppr.find(_W + "jc") if ppr is not None else None
    align = jc.get(_W + "val") if jc is not None else None
    if align == "center":
        return text.rjust((_LINE_WIDTH + len(text)) // 2)
    if align in ("right", "end"):
        return text.rjust(_LINE_WIDTH)
    return text


def xml2text(xml: bytes) -> str:
    """Render one WordprocessingML part to text, one line per paragraph."""
    root = ET.fromstring(xml)
    out: list[str] = []
    for p in root.iter(_W + "p"):
        out.append("\n")
        out.append(_render_paragraph(p))
    return "".join(out)


def extract_from_docx_bytes(data: bytes) -> tuple[str, str, int]:
    """(content, err, returncode) for a DOCX payload — the reference's
    ``extract_from_docx`` shape (tasks.py:322-334)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("word/document.xml")
        return xml2text(xml), "", 0
    except (zipfile.BadZipFile, KeyError, OSError, ET.ParseError) as exc:
        return "", f"docx parse failure: {type(exc).__name__}", 1


def build_docx(paragraphs: list[str]) -> bytes:
    """Minimal DOCX writer for fixtures: one ``word/document.xml`` with the
    given paragraphs (deterministic zip: fixed timestamps)."""
    body = "".join(
        "<w:p><w:r><w:t xml:space=\"preserve\">{}</w:t></w:r></w:p>".format(
            p.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        f"{body}</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
        '+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in (
            ("[Content_Types].xml", content_types),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload)
    return buf.getvalue()
