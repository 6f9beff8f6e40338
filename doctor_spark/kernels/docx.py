"""From-scratch DOCX text extraction (stdlib zipfile + regex over OOXML).

The reference shells out to the ``docx2txt`` CLI (doctor/tasks.py:322-334).
That binary is absent here, and DOCX is a documented zip-of-XML format, so
this kernel extracts ``word/document.xml`` and renders paragraph text:

- each ``<w:p>`` paragraph → one line
- ``<w:t>`` runs concatenated; ``<w:tab/>`` → TAB; ``<w:br/>``/``<w:cr/>``
  → newline
- XML entities resolved

Output semantics are this engine's own (frozen in tests); the reference's
docx golden is a plain-text prefix assertion (doctor/tests.py:192-214),
which this rendering satisfies for text-first documents.
"""

from __future__ import annotations

import io
import re
import zipfile
from html import unescape

_PARA_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.DOTALL)
_TOKEN_RE = re.compile(
    rb"<w:t(?:[ >][^<]*?)?>(?P<text>.*?)</w:t>|<w:tab/>|<w:br/>|<w:cr/>",
    re.DOTALL,
)


def extract_from_docx_bytes(data: bytes) -> tuple[str, str, int]:
    """(content, err, returncode) for a DOCX payload."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError) as exc:
        return "", f"docx parse failure: {type(exc).__name__}", 1

    paragraphs: list[str] = []
    for para in _PARA_RE.findall(xml):
        parts: list[str] = []
        for m in _TOKEN_RE.finditer(para):
            tok = m.group(0)
            if tok.startswith(b"<w:t"):
                parts.append(unescape(m.group("text").decode("utf-8", "replace")))
            elif tok == b"<w:tab/>":
                parts.append("\t")
            else:
                parts.append("\n")
        paragraphs.append("".join(parts))
    return "\n".join(paragraphs), "", 0


def build_docx(paragraphs: list[str]) -> bytes:
    """Minimal DOCX writer for fixtures: one ``word/document.xml`` with the
    given paragraphs (deterministic zip: fixed timestamps, stored entries)."""
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
