"""From-scratch PDF reader + layout text reconstruction (stdlib-only).

Reimplements, over raw bytes, the observable semantics of the reference's
PDF path — without poppler/pdfplumber/PyPDF2:

- layout text extraction (x-y line reconstruction) — reference
  ``make_pdftotext_process`` (``pdftotext -layout``, doctor/tasks.py:75-89)
  and ``get_page_text`` (pdfplumber ``extract_text(layout=True,
  y_tolerance=5, y_density=25)``, doctor/lib/text_extraction.py:32-69)
- skew filter (CTM ``skew_x != 0`` drop) — text_extraction.py:11-29
- strip-margin crop (1"..10" band of a portrait page) —
  text_extraction.py:44-53
- OCR-needed gates — ``ocr_needed``/``pdf_has_images``
  (doctor/lib/utils.py:290-314) and ``page_needs_ocr``/``has_images``/
  ``has_text_annotations`` (text_extraction.py:72-145)
- page count (``/Type /Page`` objects; 0 on parse error) — tasks.py:158-191
- PACER header-stamp document number — tasks.py:637-680
- full extraction pipelines ``extract_from_pdf`` (tasks.py:194-234) and
  ``extract_recap_pdf`` (tasks.py:683-703), with OCR as a pluggable backend

Scope: the deterministic synthetic corpus this engine is tested and benched
on (see ``pdfwriter.py``) — uncompressed or FlateDecode streams, Tm/Td/TD/
T*/Tj/TJ/' text operators, fixed-pitch WinAnsi text.  Real-world tolerance:
objects are discovered by scanning (no xref trust), unknown operators are
skipped, any parse error degrades to an ``err`` record, never an exception.
"""

from __future__ import annotations

import json
import re
import zlib
from dataclasses import dataclass, field
from typing import Callable

# fixed-pitch font model shared with pdfwriter: glyph advance = 0.6 * size
CHAR_WIDTH_FACTOR = 0.6
X_DENSITY = 7.2   # one text column, points (pdfplumber layout default 7.25≈)
Y_DENSITY = 25.0  # one text row, points (reference y_density=25)
Y_TOLERANCE = 5.0  # same-line clustering tolerance (reference y_tolerance=5)

_IMAGE_BYTES_RE = re.compile(rb"/Image ?")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page[^s]")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")

_DOCNUM_RE = re.compile(
    r"Document:(.[0-9.\-.\#]+)|Document(.[0-9.\-.\#]+)"
    r"|Doc:(.[0-9.\-.\#]+)|DktEntry:(.[0-9.\-.\#]+)"
)


class PdfParseError(Exception):
    pass


# --------------------------------------------------------------------------
# low-level object model
# --------------------------------------------------------------------------


class Name(str):
    """A PDF name token (/Foo) — distinct from a string literal."""


@dataclass
class Ref:
    num: int
    gen: int = 0

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


@dataclass
class StreamObj:
    attrs: dict
    raw: bytes

    def data(self) -> bytes:
        filt = self.attrs.get("Filter")
        filters = filt if isinstance(filt, list) else [filt] if filt else []
        out = self.raw
        for f in filters:
            if f == "FlateDecode":
                out = zlib.decompress(out)
            elif f is None:
                continue
            else:
                raise PdfParseError(f"unsupported filter {f}")
        return out


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Recursive-descent parser for PDF object syntax."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    _WS_RE = re.compile(rb"[\x00\t\n\x0c\r ]*")

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while True:
            self.pos = self._WS_RE.match(d, self.pos).end()
            if self.pos < n and d[self.pos] == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_value(self):
        self._skip_ws()
        d, p = self.data, self.pos
        if p >= len(d):
            raise PdfParseError("eof")
        c = d[p]
        if d.startswith(b"<<", p):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        if d.startswith(b"true", p):
            self.pos = p + 4
            return True
        if d.startswith(b"false", p):
            self.pos = p + 5
            return False
        if d.startswith(b"null", p):
            self.pos = p + 4
            return None
        return self._parse_number_or_ref()

    _NAME_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")

    def _parse_name(self) -> Name:
        self.pos += 1
        m = self._NAME_RE.match(self.data, self.pos)
        self.pos = m.end()
        raw = m.group()
        # #xx escapes
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name_at_cursor()
            val = self.parse_value()
            out[str(key)] = val

    def _parse_name_at_cursor(self) -> Name:
        self._skip_ws()
        if self.data[self.pos] != 0x2F:
            raise PdfParseError(f"expected name at {self.pos}")
        return self._parse_name()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_string(self) -> bytes:
        # returns raw latin-1 bytes of the literal, escapes resolved
        self.pos += 1
        d = self.data
        # fast path: no escapes / no nesting before the closing paren
        # (the overwhelmingly common case in real content streams)
        end = d.find(b")", self.pos)
        if end != -1:
            chunk = d[self.pos : end]
            if b"\\" not in chunk and b"(" not in chunk:
                self.pos = end + 1
                return chunk
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f"}[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfParseError("unterminated string")

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.index(b">", self.pos)
        hx = re.sub(rb"\s", b"", self.data[self.pos : end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode())

    _NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
    _REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")

    def _parse_number_or_ref(self):
        m = self._REF_RE.match(self.data, self.pos)
        if m:
            self.pos = m.end()
            return Ref(int(m.group(1)), int(m.group(2)))
        m = self._NUM_RE.match(self.data, self.pos)
        if not m:
            raise PdfParseError(f"bad token at {self.pos}: {self.data[self.pos:self.pos+20]!r}")
        self.pos = m.end()
        tok = m.group()
        return float(tok) if b"." in tok else int(tok)


# --------------------------------------------------------------------------
# document model
# --------------------------------------------------------------------------


@dataclass
class TextRun:
    text: str
    x: float
    y: float           # PDF user-space y of the baseline (bottom-up)
    size: float
    skewed: bool
    fontname: str

    def width(self) -> float:
        return len(self.text) * CHAR_WIDTH_FACTOR * self.size


@dataclass
class ImageInfo:
    width: float
    height: float
    synth_ocr: list[dict] | None = None


@dataclass
class Page:
    number: int                    # 1-based
    width: float
    height: float
    runs: list[TextRun] = field(default_factory=list)
    images: list[ImageInfo] = field(default_factory=list)
    annot_subtypes: list[str] = field(default_factory=list)
    curve_count: int = 0
    black_rects: list[tuple[float, float, float, float]] = field(
        default_factory=list
    )


@dataclass
class PdfDocument:
    pages: list[Page]

    @property
    def page_count(self) -> int:
        return len(self.pages)


def _scan_objects(data: bytes) -> dict[int, object]:
    """Discover objects by scanning for ``N G obj`` — deliberately not
    trusting the xref table (the reference's page-count path must survive
    broken xrefs; tasks.py:166-182 returns 0 instead of raising)."""
    objects: dict[int, object] = {}
    covered_until = 0  # skip 'N G obj' byte patterns inside stream payloads
    for m in _OBJ_RE.finditer(data):
        if m.start() < covered_until:
            continue
        num = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            val = lex.parse_value()
        except (PdfParseError, IndexError, ValueError):
            continue
        # stream?
        tail = data[lex.pos : lex.pos + 20]
        if isinstance(val, dict) and tail.lstrip(b"\r\n \t").startswith(b"stream"):
            s = data.index(b"stream", lex.pos) + len(b"stream")
            if data[s : s + 2] == b"\r\n":
                s += 2
            elif data[s : s + 1] == b"\n":
                s += 1
            length = val.get("Length")
            if isinstance(length, int):
                raw = data[s : s + length]
            else:
                end = data.find(b"endstream", s)
                raw = data[s : end if end != -1 else len(data)]
                raw = raw.rstrip(b"\r\n")
            objects[num] = StreamObj(val, raw)
            covered_until = s + len(raw)
        else:
            objects[num] = val
    return objects


def _resolve(obj, objects):
    seen = 0
    while isinstance(obj, Ref) and seen < 32:
        obj = objects.get(obj.num)
        seen += 1
    return obj


def _page_order(objects: dict[int, object]) -> list[int]:
    """Page object numbers in document order: walk the /Pages tree when
    present, fall back to object-number order."""
    page_nums = [
        n for n, o in objects.items()
        if isinstance(o, dict) and o.get("Type") == "Page"
    ]
    roots = [
        o for o in objects.values()
        if isinstance(o, dict) and o.get("Type") == "Catalog"
    ]
    if roots:
        pages_ref = roots[0].get("Pages")
        ordered: list[int] = []

        def walk(node_ref):
            node = _resolve(node_ref, objects)
            if not isinstance(node, dict):
                return
            if node.get("Type") == "Page":
                if isinstance(node_ref, Ref):
                    ordered.append(node_ref.num)
                return
            for kid in node.get("Kids", []) or []:
                walk(kid)

        walk(pages_ref)
        if ordered:
            return ordered
    return sorted(page_nums)


class _Matrix:
    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a=1.0, b=0.0, c=0.0, d=1.0, e=0.0, f=0.0):
        self.a, self.b, self.c, self.d, self.e, self.f = a, b, c, d, e, f

    def translated(self, tx: float, ty: float) -> "_Matrix":
        return _Matrix(
            self.a, self.b, self.c, self.d,
            tx * self.a + ty * self.c + self.e,
            tx * self.b + ty * self.d + self.f,
        )

    def clone(self) -> "_Matrix":
        return _Matrix(self.a, self.b, self.c, self.d, self.e, self.f)


_CONTENT_TOKEN = re.compile(
    rb"""
      (?P<str>\()                       # string start
    | (?P<arr>\[)                       # array start
    | (?P<name>/[^\s()<>\[\]{}/%]*)
    | (?P<num>[+-]?\d*\.?\d+)
    | (?P<op>[A-Za-z'"*]{1,3})
    """,
    re.VERBOSE,
)


def _interpret_content(
    content: bytes, fonts: dict[str, str]
) -> tuple[list[TextRun], int, list[tuple[float, float, float, float]]]:
    """Execute the text-positioning subset of a content stream.

    Returns (runs, curve_op_count, black_filled_rects).  Unknown operators
    are ignored; operand stack is cleared per operator like a real
    interpreter.  Filled near-black rectangles are tracked for the
    bad-redaction detector (reference tasks.py:134-152, the x-ray lib's
    core heuristic: a black box drawn over recoverable text).
    """
    runs: list[TextRun] = []
    curves = 0
    black_rects: list[tuple[float, float, float, float]] = []
    pending_rects: list[tuple[float, float, float, float]] = []
    fill_black = False
    tm = _Matrix()
    lm = _Matrix()
    leading = 0.0
    size = 12.0
    fontname = ""
    stack: list = []
    pos = 0
    n = len(content)
    lex = _Lexer(content)

    def show(sval) -> None:
        nonlocal tm
        if isinstance(sval, bytes):
            text = sval.decode("cp1252", errors="replace")
        else:
            text = str(sval)
        if not text:
            return
        runs.append(
            TextRun(text=text, x=tm.e, y=tm.f, size=size,
                    skewed=(tm.b != 0), fontname=fontname)
        )
        tm = tm.translated(len(text) * CHAR_WIDTH_FACTOR * size, 0.0)

    def show_tj_array(arr) -> None:
        nonlocal tm
        for item in arr:
            if isinstance(item, bytes):
                show(item)
            elif isinstance(item, (int, float)):
                tm = tm.translated(-item / 1000.0 * size, 0.0)

    while pos < n:
        m = _CONTENT_TOKEN.search(content, pos)
        if not m:
            break
        if m.lastgroup == "str":
            lex.pos = m.start()
            stack.append(lex._parse_string())
            pos = lex.pos
            continue
        if m.lastgroup == "arr":
            lex.pos = m.start()
            try:
                stack.append(lex._parse_array())
                pos = lex.pos
            except (PdfParseError, IndexError):
                pos = m.end()
            continue
        if m.lastgroup == "name":
            stack.append(m.group()[1:].decode("latin-1"))
            pos = m.end()
            continue
        if m.lastgroup == "num":
            tok = m.group()
            stack.append(float(tok) if b"." in tok else int(tok))
            pos = m.end()
            continue

        op = m.group()
        pos = m.end()
        try:
            if op == b"Tf" and len(stack) >= 2:
                size = float(stack[-1])
                fontname = fonts.get(str(stack[-2]), str(stack[-2]))
            elif op == b"Tm" and len(stack) >= 6:
                a, b_, c, d, e, f = (float(v) for v in stack[-6:])
                tm = _Matrix(a, b_, c, d, e, f)
                lm = tm.clone()
            elif op == b"Td" and len(stack) >= 2:
                lm = lm.translated(float(stack[-2]), float(stack[-1]))
                tm = lm.clone()
            elif op == b"TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lm = lm.translated(float(stack[-2]), float(stack[-1]))
                tm = lm.clone()
            elif op == b"TL" and stack:
                leading = float(stack[-1])
            elif op == b"T*":
                lm = lm.translated(0.0, -leading)
                tm = lm.clone()
            elif op == b"BT":
                tm = _Matrix()
                lm = _Matrix()
            elif op == b"Tj" and stack:
                show(stack[-1])
            elif op == b"'" and stack:
                lm = lm.translated(0.0, -leading)
                tm = lm.clone()
                show(stack[-1])
            elif op == b'"' and len(stack) >= 3:
                lm = lm.translated(0.0, -leading)
                tm = lm.clone()
                show(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                show_tj_array(stack[-1])
            elif op in (b"c", b"v", b"y"):
                curves += 1
            elif op == b"rg" and len(stack) >= 3:
                fill_black = sum(float(v) for v in stack[-3:]) < 0.3
            elif op == b"g" and stack:
                fill_black = float(stack[-1]) < 0.1
            elif op == b"re" and len(stack) >= 4:
                x, y, w, h = (float(v) for v in stack[-4:])
                pending_rects.append((x, y, w, h))
            elif op in (b"f", b"F", b"b", b"B"):
                if fill_black:
                    black_rects.extend(pending_rects)
                pending_rects.clear()
            elif op in (b"n", b"S", b"s"):
                pending_rects.clear()
        except (TypeError, ValueError):
            pass
        stack.clear()

    return runs, curves, black_rects


def parse_pdf(data: bytes) -> PdfDocument:
    """Parse PDF bytes into pages of text runs + images + annotations."""
    if not data.lstrip()[:5].startswith(b"%PDF-") and b"%PDF-" not in data[:1024]:
        raise PdfParseError("not a PDF")
    objects = _scan_objects(data)
    pages: list[Page] = []
    for idx, pnum in enumerate(_page_order(objects), start=1):
        pdict = objects[pnum]
        media = _resolve(pdict.get("MediaBox"), objects)
        if not media:
            # inherit from any /Pages node
            for o in objects.values():
                if isinstance(o, dict) and o.get("Type") == "Pages" and o.get("MediaBox"):
                    media = o["MediaBox"]
                    break
        media = media or [0, 0, 612, 792]
        width = float(media[2]) - float(media[0])
        height = float(media[3]) - float(media[1])

        # fonts: resource alias -> BaseFont name
        fonts: dict[str, str] = {}
        res = _resolve(pdict.get("Resources"), objects) or {}
        font_dict = _resolve(res.get("Font"), objects) or {}
        for alias, fref in font_dict.items():
            fobj = _resolve(fref, objects)
            if isinstance(fobj, dict):
                fonts[alias] = str(fobj.get("BaseFont", alias))

        # content
        content_parts: list[bytes] = []
        contents = pdict.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        for cref in refs:
            cobj = _resolve(cref, objects)
            if isinstance(cobj, StreamObj):
                try:
                    content_parts.append(cobj.data())
                except (PdfParseError, zlib.error):
                    pass
        runs, curves, black_rects = _interpret_content(
            b"\n".join(content_parts), fonts
        )

        # images (XObjects in resources)
        images: list[ImageInfo] = []
        xobjs = _resolve(res.get("XObject"), objects) or {}
        for _alias, xref in xobjs.items():
            xobj = _resolve(xref, objects)
            if isinstance(xobj, StreamObj) and xobj.attrs.get("Subtype") == "Image":
                synth = None
                if xobj.attrs.get("SynthOCR"):
                    try:
                        synth = json.loads(xobj.data().decode("utf-8"))
                    except (ValueError, PdfParseError, zlib.error):
                        synth = None
                images.append(
                    ImageInfo(
                        width=float(xobj.attrs.get("Width", 0)),
                        height=float(xobj.attrs.get("Height", 0)),
                        synth_ocr=synth,
                    )
                )

        # annotations
        annot_subtypes: list[str] = []
        for aref in (pdict.get("Annots") or []):
            aobj = _resolve(aref, objects)
            if isinstance(aobj, dict) and "Subtype" in aobj:
                annot_subtypes.append(str(aobj["Subtype"]))

        pages.append(
            Page(number=idx, width=width, height=height, runs=runs,
                 images=images, annot_subtypes=annot_subtypes,
                 curve_count=curves, black_rects=black_rects)
        )
    return PdfDocument(pages=pages)


# --------------------------------------------------------------------------
# layout reconstruction
# --------------------------------------------------------------------------


def layout_page_text(
    page: Page,
    *,
    drop_skewed: bool = False,
    crop_band: tuple[float, float] | None = None,
    x_density: float = X_DENSITY,
    y_density: float = Y_DENSITY,
    y_tolerance: float = Y_TOLERANCE,
) -> str:
    """x-y layout reconstruction of one page's text runs.

    Mirrors ``pdftotext -layout`` / pdfplumber ``extract_text(layout=True)``
    semantics as used by the reference: runs clustered into lines by y
    (tolerance ``y_tolerance``), blank lines synthesized per ``y_density``
    of vertical gap, column position = x / ``x_density``.

    ``crop_band`` is (top_min, top_max) in top-based coordinates — the
    strip-margin crop keeps 1"..10" of a portrait page
    (text_extraction.py:44-53).
    """
    runs = page.runs
    if drop_skewed:
        runs = [r for r in runs if not r.skewed]
    if crop_band is not None:
        lo, hi = crop_band
        runs = [r for r in runs if lo <= (page.height - r.y) <= hi]
    if not runs:
        return ""

    # cluster into lines by top-based y
    items = sorted(runs, key=lambda r: (page.height - r.y, r.x))
    lines: list[tuple[float, list[TextRun]]] = []
    for r in items:
        y_top = page.height - r.y
        if lines and y_top - lines[-1][0] <= y_tolerance:
            lines[-1][1].append(r)
        else:
            lines.append((y_top, [r]))

    out: list[str] = []
    prev_y: float | None = None
    for y_top, line_runs in lines:
        if prev_y is not None:
            gap = y_top - prev_y
            out.extend("" for _ in range(max(0, int(gap / y_density) - 1)))
        prev_y = y_top
        buf = ""
        for r in sorted(line_runs, key=lambda rr: rr.x):
            col = int(round(r.x / x_density))
            if col > len(buf):
                buf += " " * (col - len(buf))
            elif col < len(buf):
                buf += " "  # overlapping runs: keep both, single separator
            buf += r.text
        out.append(buf)
    return "\n".join(out)


def strip_margin_band(page: Page) -> tuple[float, float] | None:
    """The reference's strip-margin crop: only for portrait pages, keep the
    1"..10"-from-top band (text_extraction.py:44-53)."""
    if page.height > page.width:
        ppi = page.width / 8.5
        return (ppi * 1.0, ppi * 10.0)
    return None


# --------------------------------------------------------------------------
# heuristics / metadata
# --------------------------------------------------------------------------


def pdf_has_images(data: bytes) -> bool:
    """Raw-bytes image sniff (reference utils.py:290-302)."""
    return bool(_IMAGE_BYTES_RE.search(data))


def ocr_needed(data: bytes, content: str) -> bool:
    """Whole-document OCR gate (reference utils.py:305-314)."""
    return content.strip() == "" or pdf_has_images(data)


def page_has_images(page: Page) -> bool:
    """Images big enough to contain text (reference text_extraction.py:72-82)."""
    return any(im.width > 10 and im.height > 10 for im in page.images)


def page_has_text_annotations(page: Page) -> bool:
    """FreeText/Widget annotations (reference text_extraction.py:85-97)."""
    return any(s in ("FreeText", "Widget") for s in page.annot_subtypes)


def page_needs_ocr(page: Page, page_text: str) -> bool:
    """Per-page OCR gate (reference text_extraction.py:132-145)."""
    return (
        page_text.strip() == ""
        or "(cid:" in page_text
        or page_has_text_annotations(page)
        or page_has_images(page)
        or page.curve_count > 10
    )


def get_page_count(
    data: bytes, extension: str, doc: "PdfDocument | None" = None
) -> int | None:
    """Page count for PDFs; 0 on parse error; None for other formats
    (reference tasks.py:158-191).  Pass a pre-parsed ``doc`` to avoid
    re-parsing (the document flows parse once and share it)."""
    if extension != "pdf":
        return None
    try:
        doc = doc or parse_pdf(data)
        if doc.page_count:
            return doc.page_count
    except Exception:
        pass
    # regex fallback mirrors the spirit of the reference's broad excepts
    try:
        return len(_PAGE_TYPE_RE.findall(data))
    except Exception:
        return 0


def clean_document_number(document_number: str) -> str:
    """Strip #, leading/trailing whitespace (reference tasks.py:651-659)."""
    return document_number.strip().replace("#", "")


def get_document_number(data: bytes) -> str:
    """PACER document number from the page-1 header stamp (reference
    tasks.py:637-680): runs in LiberationSans or with y0 > 750, regexed for
    Document:/Doc:/DktEntry: forms."""
    try:
        doc = parse_pdf(data)
    except Exception:
        return ""
    if not doc.pages:
        return ""
    page = doc.pages[0]
    stamp_runs = [
        r for r in page.runs
        if "LiberationSans" in r.fontname or r.y > 750
    ]
    stamp_page = Page(
        number=1, width=page.width, height=page.height, runs=stamp_runs
    )
    header_text = layout_page_text(stamp_page)
    matches = _DOCNUM_RE.findall(header_text)
    if not matches:
        return ""
    hit = [g for g in matches[0] if g]
    return clean_document_number(hit[0]) if hit else ""


# --------------------------------------------------------------------------
# OCR backend protocol + synthetic backend
# --------------------------------------------------------------------------

# an OCR backend maps a parsed page to a tesseract-style word table
# (list of dicts: text conf left top width height line_num par_num block_num)
OcrBackend = Callable[[Page, bool], "list[dict] | None"]


def synthetic_ocr_backend(page: Page, strip_margin: bool) -> list[dict] | None:
    """Test/bench backend: reads the word table embedded by pdfwriter inside
    the page's image XObject (the sandbox has no tesseract; the real backend
    below is pluggable, mirroring the reference's subprocess boundary)."""
    for im in page.images:
        if im.synth_ocr is not None:
            return im.synth_ocr
    return None


def tesseract_ocr_backend(page: Page, strip_margin: bool) -> list[dict] | None:
    """Production backend stub: shells out to tesseract like the reference
    (tasks.py:271-284, text_extraction.py:148-213). Not available in this
    sandbox."""
    raise NotImplementedError(
        "tesseract/ghostscript are not installed in this environment; "
        "use synthetic_ocr_backend for tests and benchmarks"
    )


# --------------------------------------------------------------------------
# document-level extraction flows
# --------------------------------------------------------------------------


def get_xray(data: bytes) -> dict:
    """Bad-redaction detection (reference ``get_xray``, tasks.py:134-152 and
    README.md:145-179): black filled rectangles with recoverable text runs
    underneath.  Returns ``{"error": bool, "results": {page -> [{bbox:
    [x0, y0, x1, y1], text}]}}`` — the reference's response shape; any
    parse failure yields ``{"error": True}`` like its broad except.
    """
    try:
        doc = parse_pdf(data)
        results: dict[int, list[dict]] = {}
        for page in doc.pages:
            hits = []
            for (rx, ry, rw, rh) in page.black_rects:
                x0, y0, x1, y1 = rx, ry, rx + rw, ry + rh
                under = [
                    r for r in sorted(page.runs, key=lambda r: (-r.y, r.x))
                    if x0 <= r.x <= x1 and y0 <= r.y + 0.5 * r.size <= y1
                ]
                if under:
                    hits.append(
                        {
                            "bbox": [x0, y0, x1, y1],
                            "text": " ".join(r.text for r in under),
                        }
                    )
            if hits:
                results[page.number] = hits
        return {"error": False, "results": results}
    except Exception:
        return {"error": True, "results": {}}


def extract_pdf_layout_text(
    data: bytes, doc: "PdfDocument | None" = None
) -> tuple[str, str, int]:
    """The ``pdftotext -layout`` analog (reference tasks.py:75-89):
    whole-document layout text, pages joined by form-feed."""
    try:
        doc = doc or parse_pdf(data)
    except Exception as exc:
        return "", f"pdf parse failure: {exc}", 1
    pages = [layout_page_text(p) for p in doc.pages]
    return "\f".join(pages) + ("\f" if pages else ""), "", 0
