"""Deterministic synthetic PDF writer — the fixture/corpus generator.

This engine cannot be tested against arbitrary wild PDFs (no poppler in the
sandbox), so correctness is defined against a corpus this writer produces:
every fixture class in the reference's test-asset inventory
(doctor/tests.py:114-190, 416-465) has a synthetic analog — multi-column
layout, image-only pages carrying an embedded OCR word table, ``(cid:``
garbage, skewed stamp text, margin content, PACER header stamps, mojibake
text, broken-magic prefixes, empty/corrupt files.

Grid model shared with the reader (doctor_spark.kernels.pdf): text column
``c`` sits at x = c * X_DENSITY, text row ``r`` at top-based
y = TOP_MARGIN + r * Y_DENSITY, glyph advance = 0.6 * fontsize, so the
layout reconstruction must reproduce the authored text grid exactly —
byte-identical goldens by construction.
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass, field

from .pdf import CHAR_WIDTH_FACTOR, X_DENSITY, Y_DENSITY

TOP_MARGIN = 72.0
FONT_SIZE = 12.0

PAGE_W, PAGE_H = 612.0, 792.0  # US letter portrait


@dataclass
class Line:
    row: int
    col: int
    text: str
    skew: bool = False
    header_stamp: bool = False      # rendered in LiberationSans above y=750
    op_style: str = "Tm"            # Tm | Td | TJ | quote — reader coverage
    y_override: float | None = None  # explicit PDF y (bottom-up baseline)


@dataclass
class PageSpec:
    lines: list[Line] = field(default_factory=list)
    image: tuple[int, int] | None = None          # (width, height) px
    ocr_words: list[dict] | None = None           # embedded synthetic table
    annots: list[str] = field(default_factory=list)  # e.g. ["FreeText"]
    curves: int = 0
    landscape: bool = False
    # bad-redaction fixtures: black rect drawn over grid rows/cols
    # (row, col, n_cols) — the text it covers goes in `lines` as usual
    redactions: list[tuple[int, int, int]] = field(default_factory=list)


def _esc(text: str) -> bytes:
    raw = text.encode("cp1252", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def line_xy(line: Line, page_h: float) -> tuple[float, float]:
    x = line.col * X_DENSITY
    if line.y_override is not None:
        return x, line.y_override
    if line.header_stamp:
        return x, 760.0  # y0 > 750 — the ca5 header-stamp band
    return x, page_h - (TOP_MARGIN + line.row * Y_DENSITY)


def _emit_line(line: Line, page_h: float) -> bytes:
    x, y = line_xy(line, page_h)
    font = b"/F2" if line.header_stamp else b"/F1"
    b_skew = b"0.5" if line.skew else b"0"
    esc = _esc(line.text)
    if line.op_style == "Td":
        return b"BT %s 12 Tf %.2f %.2f Td (%s) Tj ET\n" % (font, x, y, esc)
    if line.op_style == "quote":
        # Td to the line above, then ' moves down one leading and shows
        return (
            b"BT %s 12 Tf 25 TL %.2f %.2f Td (%s) ' ET\n"
            % (font, x, y + Y_DENSITY, esc)
        )
    if line.op_style == "TJ" and " " in line.text:
        # split on the first space; encode the gap as a TJ displacement
        head, tail = line.text.split(" ", 1)
        gap_pts = (len(head) + 1) * CHAR_WIDTH_FACTOR * FONT_SIZE
        adv_pts = len(head) * CHAR_WIDTH_FACTOR * FONT_SIZE
        adj = -(gap_pts - adv_pts) * 1000.0 / FONT_SIZE
        return (
            b"BT %s 12 Tf 1 %s 0 1 %.2f %.2f Tm [(%s) %.1f (%s)] TJ ET\n"
            % (font, b_skew, x, y, _esc(head), adj, _esc(tail))
        )
    return (
        b"BT %s 12 Tf 1 %s 0 1 %.2f %.2f Tm (%s) Tj ET\n"
        % (font, b_skew, x, y, esc)
    )


def build_pdf(
    pages: list[PageSpec],
    *,
    compress: bool = True,
    broken_magic: bool = False,
) -> bytes:
    """Serialize page specs into a complete PDF file.

    ``broken_magic`` emits junk before the ``%PDF-`` header (the reference's
    broken-mime fixtures, tests.py:327-345) — magic sniffing must rescue it
    via the ``%PDF-x.y`` in-content scan.
    """
    objs: dict[int, bytes] = {}
    next_num = 1

    def alloc() -> int:
        nonlocal next_num
        n = next_num
        next_num += 1
        return n

    catalog_num = alloc()
    pages_num = alloc()
    font1_num = alloc()
    font2_num = alloc()
    objs[font1_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )
    objs[font2_num] = (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /LiberationSans >>"
    )

    page_nums: list[int] = []
    for spec in pages:
        w, h = (PAGE_H, PAGE_W) if spec.landscape else (PAGE_W, PAGE_H)
        content = bytearray()
        for line in spec.lines:
            content += _emit_line(line, h)
        for i in range(spec.curves):
            content += b"%d %d m %d %d %d %d %d %d c S\n" % (
                i, i, i + 1, i + 1, i + 2, i + 2, i + 3, i + 3
            )
        for (r_row, r_col, r_ncols) in spec.redactions:
            rx = r_col * X_DENSITY - 1
            ry = h - (TOP_MARGIN + r_row * Y_DENSITY) - 3
            rw = r_ncols * X_DENSITY + 2
            rh = FONT_SIZE + 4
            content += b"q 0 0 0 rg %.2f %.2f %.2f %.2f re f Q\n" % (
                rx, ry, rw, rh
            )

        xobj_entries = b""
        extra_objs: list[tuple[int, bytes]] = []
        if spec.image is not None:
            img_num = alloc()
            iw, ih = spec.image
            payload = json.dumps(spec.ocr_words or []).encode()
            zpayload = zlib.compress(payload)
            synth = b" /SynthOCR true" if spec.ocr_words is not None else b""
            img_dict = (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                b" /Filter /FlateDecode /Length %d%s >>"
                % (iw, ih, len(zpayload), synth)
            )
            extra_objs.append(
                (img_num, img_dict + b"\nstream\n" + zpayload + b"\nendstream")
            )
            xobj_entries = b" /XObject << /Im0 %d 0 R >>" % img_num
            content += b"q %d 0 0 %d 50 50 cm /Im0 Do Q\n" % (iw, ih)

        annot_refs = b""
        for subtype in spec.annots:
            a_num = alloc()
            extra_objs.append(
                (a_num,
                 b"<< /Type /Annot /Subtype /%s /Rect [0 0 10 10] >>"
                 % subtype.encode())
            )
            annot_refs += b"%d 0 R " % a_num

        cont_num = alloc()
        raw = bytes(content)
        if compress:
            z = zlib.compress(raw)
            objs[cont_num] = (
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(z)
                + z + b"\nendstream"
            )
        else:
            objs[cont_num] = (
                b"<< /Length %d >>\nstream\n" % len(raw) + raw + b"\nendstream"
            )

        page_num = alloc()
        annots = b" /Annots [ %s]" % annot_refs if annot_refs else b""
        objs[page_num] = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 %d 0 R /F2 %d 0 R >>%s >>"
            b" /Contents %d 0 R%s >>"
            % (pages_num, int(w), int(h), font1_num, font2_num,
               xobj_entries, cont_num, annots)
        )
        page_nums.append(page_num)
        for num, body in extra_objs:
            objs[num] = body

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[pages_num] = (
        b"<< /Type /Pages /Kids [ %s ] /Count %d >>" % (kids, len(page_nums))
    )
    objs[catalog_num] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num

    # serialize with a correct xref table
    prefix = b"\x00\x01binjunk\x00" if broken_magic else b""
    buf = bytearray(prefix)
    buf += b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(buf)
    count = max(objs) + 1
    buf += b"xref\n0 %d\n" % count
    buf += b"0000000000 65535 f \n"
    for num in range(1, count):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (count, catalog_num, xref_pos)
    )
    return bytes(buf)


def text_to_lines(text: str, *, start_row: int = 0) -> list[Line]:
    """Author a page from a plain-text layout block: each text line becomes
    one grid row; leading spaces become the column offset.  Round-trips
    byte-identically through the reader's layout reconstruction."""
    lines: list[Line] = []
    for i, raw in enumerate(text.split("\n")):
        stripped = raw.lstrip(" ")
        if not stripped:
            continue  # blank rows materialize via the y-gap
        col = len(raw) - len(stripped)
        lines.append(Line(row=start_row + i, col=col, text=stripped.rstrip()))
    return lines
