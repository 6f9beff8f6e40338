"""Mime / extension sniffing — from-scratch magic-byte matcher.

Reimplements the reference's libmagic-backed classification semantics:

- mime sniff                      — reference doctor/views.py:283-294
- trusted-extension workarounds   — reference doctor/views.py:297-349
  (``%PDF-x.y`` content sniff at 333-339, fixes table at 341-348)
- filename-derived extension      — reference doctor/forms.py:24-31
  (``file.name.split(".")[-1]``)

No libmagic here: a small magic-byte table covers the formats the engine
extracts (pdf, doc, docx, html, txt, wpd) plus the reference's audio/image
workaround cases, and unknown bytes fall through to ``.bin`` + the
``%PDF-`` rescue sniff, exactly as the reference does.
"""

from __future__ import annotations

import re

# reference views.py:341-348
EXTENSION_FIXES: dict[str, str] = {
    ".htm": ".html",
    ".xml": ".html",
    ".wsdl": ".html",
    ".ksh": ".txt",
    ".asf": ".wma",
    ".dot": ".doc",
}

_PDF_VERSION_RE = re.compile(rb"%PDF-[0-9]+(\.[0-9]+)?")
_HTML_LEAD_RE = re.compile(
    rb"^\s*(?:\xef\xbb\xbf)?\s*<(?:!doctype\s+html|html|head|body)", re.IGNORECASE
)
_XML_LEAD_RE = re.compile(rb"^\s*(?:\xef\xbb\xbf)?\s*<\?xml", re.IGNORECASE)

# printable-ish bytes for the text heuristic (ASCII printables + tab/cr/lf)
_TEXT_BYTES = bytes(range(0x20, 0x7F)) + b"\t\r\n\x0b\x0c"


_CONTROL_BYTES = frozenset(range(0x00, 0x20)) - frozenset(b"\t\r\n\x0b\x0c")


def _is_mostly_text(buf: bytes) -> bool:
    """Text heuristic hardened against random binaries: real text never
    contains raw control bytes, and high (non-ASCII) bytes are a small
    minority even in cp1252/utf-8 prose — uniform random bytes averaging
    50% high bytes occasionally passed a printable-ratio-only check
    (observed ~1/30k docs at 240k-doc scale)."""
    if not buf:
        return False
    sample = buf[:4096]
    high = 0
    for b in sample:
        if b in _CONTROL_BYTES:
            return False
        if b >= 0x80:
            high += 1
    if high / len(sample) > 0.10:
        return False
    printable = sum(b in _TEXT_BYTES for b in sample)
    return (printable + high) / len(sample) > 0.95


def sniff_mime(content: bytes) -> str:
    """Magic-byte mime classification of a payload prefix.

    Covers the formats the reference dispatches on (views.py:132-149) and
    its libmagic workaround cases (views.py:300-322).
    """
    head = content[:4096]
    if head.startswith(b"%PDF-"):
        return "application/pdf"
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE2 compound file == legacy MS Word (views.py:303-306 workaround)
        return "application/msword"
    if head.startswith(b"PK\x03\x04"):
        # zip container; docx carries word/ part names near the front
        if b"word/" in content[:2048] or b"[Content_Types].xml" in content[:2048]:
            return (
                "application/vnd.openxmlformats-officedocument"
                ".wordprocessingml.document"
            )
        return "application/zip"
    if head[1:4] == b"WPC" or head.startswith(b"\xffWPC"):
        # WordPerfect (views.py:307-312 workarounds)
        return "application/vnd.wordperfect"
    if head.startswith(b"ID3") or head[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
        return "audio/mpeg"
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if head.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if _HTML_LEAD_RE.match(head) or _XML_LEAD_RE.match(head):
        return "text/html"
    if _is_mostly_text(head):
        # ``<html`` further in, after leading text junk, still counts
        if b"<html" in head[:1024].lower():
            return "text/html"
        return "text/plain"
    return "application/octet-stream"


_MIME_TO_EXT: dict[str, str] = {
    "application/pdf": ".pdf",
    "application/msword": ".doc",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": ".docx",
    "application/vnd.wordperfect": ".wpd",
    "text/html": ".html",
    "text/plain": ".txt",
    "audio/mpeg": ".mp3",
    "image/png": ".png",
    "image/jpeg": ".jpg",
    "image/tiff": ".tiff",
    "application/zip": ".zip",
    "application/octet-stream": ".bin",
}


def sniff_extension(content: bytes) -> str:
    """Trusted extension from content bytes, with the reference's rescue
    paths (views.py:297-349):

    - ``.obj``-ish / unknown: ``PDF`` in the first 40 bytes → ``.pdf``
    - ``.bin``: ``%PDF-x.y`` anywhere in the first 1024 bytes → ``.pdf``
    - fixes table ``{.htm→.html, .xml→.html, .wsdl→.html, .ksh→.txt,
      .asf→.wma, .dot→.doc}``; lower-cased.
    """
    mime = sniff_mime(content)
    extension = _MIME_TO_EXT.get(mime, ".bin")
    if extension == ".bin":
        if b"PDF" in content[0:40]:
            extension = ".pdf"
        elif _PDF_VERSION_RE.search(content[:1024]):
            extension = ".pdf"
    return EXTENSION_FIXES.get(extension, extension).lower()


def extension_from_url(url: str) -> str:
    """Filename-suffix extension, the reference's primary routing signal
    (forms.py:24-31: ``file.name.split(".")[-1]``); empty when the final
    path segment has no dot."""
    path = url.split("?", 1)[0].split("#", 1)[0]
    segment = path.rstrip("/").rsplit("/", 1)[-1]
    if "." not in segment:
        return ""
    ext = segment.rsplit(".", 1)[-1].lower()
    # the same trust fixes apply to claimed suffixes
    return EXTENSION_FIXES.get(f".{ext}", f".{ext}").lstrip(".")


def classify(url: str, content: bytes) -> tuple[str, str]:
    """(mime, routing-extension) for one document.

    Routing policy mirrors the reference's two-step trust model: the
    filename suffix routes when it names a format we extract
    (views.py:132-149 dispatches on the form's filename-derived extension);
    otherwise fall back to content sniffing (the /utils/file/extension/
    rescue path).
    """
    mime = sniff_mime(content)
    ext = extension_from_url(url)
    if ext not in {"pdf", "doc", "docx", "html", "txt", "wpd"}:
        ext = sniff_extension(content).lstrip(".")
    return mime, ext
