"""First-page rasterization and PNG thumbnails (reference V2).

Reimplements ``pdftoppm -singlefile -f <p> -scale-to <max> -png``
(reference ``make_png_thumbnail_for_instance`` / ``make_png_thumbnails``,
doctor/lib/utils.py:164-218, behind views.py:196-240; default
``max_dimension=350`` per forms.py:83-92) as a from-scratch LAYOUT
rasterizer over the same parsed geometry the text-layout engines consume
(kernels/pdf.py):

- glyph boxes — per-glyph device-space extents from the CharArray store
  (real-metric fonts) or the fixed-pitch 0.6 em run model — painted black;
- embedded image XObjects at their CTM paint rects
  (``parse_pdf(collect_images=True)``): 8-bit FlateDecode
  DeviceGray/DeviceRGB rasters (the shapes this repo's own writers emit
  and the synthetic corpus embeds) are DECODED and nearest-neighbor
  resampled — true pixels, not placeholders; other filters (DCT etc.)
  paint a mid-gray block, honestly labeled by ``placeholder_images``;
- filled near-black rectangles (redaction boxes) painted black.

This is a document-layout thumbnail, not a full PDF imaging model (no
vector paths, shading, or font outlines) — exactly the honesty boundary
the OCR rasterizer declares (kernels/pdf.py tri-state backend).  The
output contract matches pdftoppm's: the page's larger dimension scales
to ``max_dimension`` preserving aspect, one PNG per requested page.
"""

from __future__ import annotations

import numpy as np

from .pdf import PdfParseError, StreamObj, parse_pdf
from .png import encode_png

# glyph ink box above the baseline, in em — cap-height-ish; descenders
# are ignored (a layout thumbnail cares about line mass, not outlines)
_ASCENT = 0.7
# fixed-pitch model: ink covers this fraction of the 0.6 em advance
_RUN_INK = 0.5
_RUN_ADVANCE = 0.6


class RasterError(ValueError):
    """Page cannot be rasterized."""


def _decode_image_pixels(sobj: StreamObj) -> np.ndarray | None:
    """8-bit Flate gray/RGB image XObject → uint8 grayscale array, or
    None when the payload needs a codec this engine does not implement
    (DCTDecode/JBIG2/CCITT — the reference delegates those to poppler)."""
    attrs = sobj.attrs
    filt = attrs.get("Filter")
    if filt is not None and str(filt) != "FlateDecode":
        return None
    try:
        w = int(attrs.get("Width", 0))
        h = int(attrs.get("Height", 0))
        bpc = int(attrs.get("BitsPerComponent", 8))
    except (TypeError, ValueError):
        return None
    if w <= 0 or h <= 0 or bpc != 8 or w * h > 64_000_000:
        return None
    cs = str(attrs.get("ColorSpace", ""))
    try:
        raw = sobj.data()
    except Exception:
        return None
    if cs == "DeviceGray" and len(raw) >= w * h:
        return np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
    if cs == "DeviceRGB" and len(raw) >= w * h * 3:
        rgb = np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)
        # integer luma (floor mean) — deterministic across platforms
        return (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    return None


def rasterize_page(page, scale: float) -> tuple[np.ndarray, int]:
    """One parsed page → uint8 grayscale canvas (row 0 = top of page).

    Returns ``(canvas, placeholder_images)`` — the count of embedded
    images whose pixels could not be decoded and were painted as gray
    blocks (the honesty signal)."""
    w_px = max(1, int(page.width * scale + 0.5))
    h_px = max(1, int(page.height * scale + 0.5))
    canvas = np.full((h_px, w_px), 255, dtype=np.uint8)

    def cols(x0: float, x1: float) -> tuple[int, int]:
        c0 = max(0, min(w_px, int(x0 * scale + 0.5)))
        c1 = max(0, min(w_px, int(x1 * scale + 0.5)))
        return c0, max(c1, c0 + 1 if c0 < w_px else c1)

    def rows(y0: float, y1: float) -> tuple[int, int]:
        # device y is bottom-up; canvas rows are top-down
        r0 = max(0, min(h_px, h_px - int(y1 * scale + 0.5)))
        r1 = max(0, min(h_px, h_px - int(y0 * scale + 0.5)))
        return r0, max(r1, r0 + 1 if r0 < h_px else r1)

    placeholders = 0
    # 1. images under everything else (paint order within the page is
    #    approximated: image -> text -> redaction rects, matching how the
    #    corpus and court documents actually layer)
    for (x0, y0, x1, y1, sobj) in page.image_rects:
        c0, c1 = cols(x0, x1)
        r0, r1 = rows(y0, y1)
        if c1 <= c0 or r1 <= r0:
            continue
        px = _decode_image_pixels(sobj)
        if px is None:
            canvas[r0:r1, c0:c1] = 128
            placeholders += 1
            continue
        ph, pw = px.shape
        # deterministic nearest-neighbor resample; image space row 0 is
        # the TOP of the painted rect (ISO 32000-1 §8.9.3)
        ri = (np.arange(r1 - r0) * ph) // (r1 - r0)
        ci = (np.arange(c1 - c0) * pw) // (c1 - c0)
        canvas[r0:r1, c0:c1] = px[np.ix_(ri, ci)]

    # 2. glyph ink: the CharArray store (metric fonts)
    ch = page.chars
    if len(ch):
        space = ch.isspace_mask()
        for i in range(len(ch)):
            if space[i] or ch.skewed[i]:
                continue
            c0, c1 = cols(float(ch.x0[i]), float(ch.x1[i]))
            y = float(ch.y[i])
            r0, r1 = rows(y, y + _ASCENT * float(ch.size[i]))
            canvas[r0:r1, c0:c1] = 0
    # 3. glyph ink: fixed-pitch runs (synthetic / metric-less fonts) —
    #    per-character boxes so word shapes emerge at thumbnail scale
    elif page.runs:
        for run in page.runs:
            if run.skewed or run.invisible:
                continue
            adv = _RUN_ADVANCE * run.size
            for i, chtxt in enumerate(run.text):
                if chtxt.isspace():
                    continue
                x = run.x + i * adv
                c0, c1 = cols(x, x + _RUN_INK * run.size)
                r0, r1 = rows(run.y, run.y + _ASCENT * run.size)
                canvas[r0:r1, c0:c1] = 0

    # 4. redaction/fill rects on top
    for (rx, ry, rw, rh) in page.black_rects:
        c0, c1 = cols(rx, rx + rw)
        r0, r1 = rows(ry, ry + rh)
        canvas[r0:r1, c0:c1] = 0
    return canvas, placeholders


def pdf_thumbnail(
    data: bytes, max_dimension: int = 350, page: int = 1
) -> bytes:
    """V2 single-page path (``-singlefile -f <page> -scale-to <max>``,
    utils.py:164-189): PNG thumbnail bytes of one page.  The larger page
    dimension scales to ``max_dimension``; parsing stops at the
    requested page (a 500-page filing pays one page of layout)."""
    try:
        doc = parse_pdf(data, max_pages=page, collect_images=True)
    except PdfParseError as exc:
        raise RasterError(str(exc)) from exc
    if page < 1 or page > len(doc.pages):
        raise RasterError(f"page {page} out of range ({len(doc.pages)})")
    pg = doc.pages[page - 1]
    longest = max(pg.width, pg.height)
    if longest <= 0:
        raise RasterError("degenerate page box")
    canvas, _ = rasterize_page(pg, max_dimension / longest)
    return encode_png(canvas)


def pdf_thumbnails(
    data: bytes, max_dimension: int, pages: list[int]
) -> dict[int, bytes]:
    """V2 range path (``make_png_thumbnails`` + zip, utils.py:192-218,
    views.py:215-240): one PNG per requested 1-based page number; the
    reference zips ``thumb-<page>.png`` members — the dict here is that
    archive's content, keyed by page."""
    try:
        doc = parse_pdf(
            data, max_pages=max(pages) if pages else 1, collect_images=True
        )
    except PdfParseError as exc:
        raise RasterError(str(exc)) from exc
    out: dict[int, bytes] = {}
    for p in pages:
        if p < 1 or p > len(doc.pages):
            continue  # pdftoppm writes nothing for out-of-range pages
        pg = doc.pages[p - 1]
        longest = max(pg.width, pg.height)
        if longest <= 0:
            continue
        canvas, _ = rasterize_page(pg, max_dimension / longest)
        out[p] = encode_png(canvas)
    return out
