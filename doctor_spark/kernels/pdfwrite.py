"""PDF writing: deterministic re-serialization (metadata strip, V3) and
image→PDF assembly (V1).

Reference semantics reimplemented from scratch:

- ``strip_pdf_metadata`` — reference ``strip_metadata_from_bytes``
  (doctor/tasks.py:39-53): pypdf ``PdfMerger`` rebuilds the document and
  sets ``{"/CreationDate": "", "/ModDate": ""}``; the stated purpose is
  "Stripping the metadata allows us to hash the PDFs", so the contract
  here is DETERMINISM — two inputs differing only in their metadata
  serialize to byte-identical output.  This writer re-emits the parsed
  object model (kernels/pdf.py) as a classic-xref PDF: objects in
  numeric order, dict keys sorted, hex-encoded strings, ObjStm members
  promoted to top level, XMP ``/Metadata`` dropped from the catalog, and
  a fresh two-key Info dict.
- ``pdf_from_images`` — reference ``pdf_bytes_from_images``
  (doctor/tasks.py:55-72): PIL saves a list of images as one PDF page
  per image at ``resolution=100`` (page size = pixels × 72/100 pt).
  Here each image is an uint8 numpy raster (the shape
  :mod:`.png`'s ``decode_png`` returns) embedded as a FlateDecode
  DeviceRGB/DeviceGray image XObject.

Both fail closed (``PdfWriteError``) rather than emitting garbage.
"""

from __future__ import annotations

import zlib

import numpy as np

from .pdf import (
    Name,
    PdfParseError,
    Ref,
    StreamObj,
    _find_encrypt,
    _inherited,
    _LazyObj,
    _materialize,
    _page_order,
    _resolve,
    _scan_objects,
)


class PdfWriteError(ValueError):
    """Document cannot be deterministically re-serialized."""


_NAME_OK = frozenset(
    b"!\"$&'*+,-.0123456789:;=?@ABCDEFGHIJKLMNOPQRSTUVWXYZ^_`"
    b"abcdefghijklmnopqrstuvwxyz|~"
)


def _ser_name(n: str) -> bytes:
    out = bytearray(b"/")
    for b in n.encode("latin-1", errors="replace"):
        if b in _NAME_OK:
            out.append(b)
        else:
            out += b"#%02X" % b
    return bytes(out)


def _ser_float(v: float) -> bytes:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v)).encode()
    return (f"{v:.6f}").rstrip("0").rstrip(".").encode()


def serialize_value(v) -> bytes:
    """One PDF value → bytes, deterministically (sorted dict keys,
    hex-encoded strings)."""
    if v is None:
        return b"null"
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, Name):
        return _ser_name(str(v))
    if isinstance(v, Ref):
        return b"%d %d R" % (v.num, v.gen)
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, float):
        return _ser_float(v)
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, str):  # parsed names arrive as Name, but be safe
        return _ser_name(v)
    if isinstance(v, list):
        return b"[" + b" ".join(serialize_value(x) for x in v) + b"]"
    if isinstance(v, dict):
        parts = []
        for k in sorted(v, key=str):
            parts.append(_ser_name(str(k)) + b" " + serialize_value(v[k]))
        return b"<<" + b" ".join(parts) + b">>"
    raise PdfWriteError(f"unserializable value type {type(v).__name__}")


def _ser_object(num: int, obj) -> bytes:
    if isinstance(obj, StreamObj):
        attrs = dict(obj.attrs)
        attrs["Length"] = len(obj.raw)  # indirect /Length refs resolved
        body = (
            serialize_value(attrs)
            + b"\nstream\n"
            + obj.raw
            + b"\nendstream"
        )
    else:
        body = serialize_value(obj)
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def serialize_pdf(objects: dict[int, object], root_num: int,
                  info: dict | None = None) -> bytes:
    """Object model → classic-xref PDF bytes, deterministically."""
    out = bytearray(b"%PDF-1.6\n%\xc2\xb5\xc2\xb6\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        obj = objects[num]
        if obj is None:
            continue
        offsets[num] = len(out)
        out += _ser_object(num, obj)
    info_num = None
    if info is not None:
        info_num = max(objects, default=0) + 1
        offsets[info_num] = len(out)
        out += _ser_object(info_num, info)
    xref_pos = len(out)
    max_num = max(offsets, default=0)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    trailer: dict = {
        Name("Size"): max_num + 1,
        Name("Root"): Ref(root_num, 0),
    }
    if info_num is not None:
        trailer[Name("Info")] = Ref(info_num, 0)
    out += b"trailer\n" + serialize_value(trailer)
    out += b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def strip_pdf_metadata(data: bytes) -> bytes:
    """Rebuild ``data`` without document metadata (reference
    tasks.py:39-53 semantics): the Info dictionary is replaced by
    ``{/CreationDate "", /ModDate ""}`` and the catalog's XMP
    ``/Metadata`` stream is dropped.  Output is deterministic: inputs
    differing only in metadata yield byte-identical results."""
    objects = _scan_objects(data)
    if _find_encrypt(data, objects) is not None:
        raise PdfWriteError("encrypted document: refusing lossy rewrite")
    # materialize lazy members — every object is re-serialized
    for num, obj in list(objects.items()):
        if type(obj) is _LazyObj:
            _materialize(objects, num, obj)
    root_num = None
    metadata_refs: set[int] = set()
    info_nums: set[int] = set()
    for num, obj in objects.items():
        if isinstance(obj, dict):
            if obj.get("Type") == "Catalog":
                root_num = num if root_num is None else root_num
                md = obj.get("Metadata")
                if isinstance(md, Ref):
                    metadata_refs.add(md.num)
                obj.pop("Metadata", None)
            elif "CreationDate" in obj or "Producer" in obj or (
                "ModDate" in obj
            ):
                if "Type" not in obj:  # a plausible docinfo dict
                    info_nums.add(num)
    if root_num is None:
        raise PdfWriteError("no document catalog")
    keep: dict[int, object] = {}
    for num, obj in objects.items():
        if num in metadata_refs or num in info_nums:
            continue
        if isinstance(obj, StreamObj) and obj.attrs.get("Type") in (
            "ObjStm", "XRef",
        ):
            continue  # members are promoted; xref is rebuilt classic
        keep[num] = obj
    info = {Name("CreationDate"): b"", Name("ModDate"): b""}
    return serialize_pdf(keep, root_num, info)


def pdf_from_images(
    images: list[np.ndarray], resolution: float = 100.0
) -> bytes:
    """uint8 rasters → one-page-per-image PDF (reference
    tasks.py:55-72: PIL ``save(..., "PDF", resolution=100.0,
    save_all=True)``).  Page size = pixels × 72/resolution pt; pixels
    embed as a FlateDecode DeviceGray/DeviceRGB image XObject drawn to
    fill the page."""
    if not images:
        raise PdfWriteError("no images")
    objects: dict[int, object] = {}
    nxt = 1

    def add(obj) -> int:
        nonlocal nxt
        objects[nxt] = obj
        nxt += 1
        return nxt - 1

    page_nums: list[int] = []
    pages_num_placeholder = add(None)  # patched after pages exist
    for arr in images:
        a = np.ascontiguousarray(arr, dtype=np.uint8)
        if a.ndim == 2:
            colorspace, h, w = "DeviceGray", a.shape[0], a.shape[1]
        elif a.ndim == 3 and a.shape[2] == 3:
            colorspace, h, w = "DeviceRGB", a.shape[0], a.shape[1]
        elif a.ndim == 3 and a.shape[2] == 4:
            a = a[:, :, :3]  # drop alpha like PIL's RGB PDF save
            colorspace, h, w = "DeviceRGB", a.shape[0], a.shape[1]
        else:
            raise PdfWriteError(f"unsupported raster shape {arr.shape}")
        img_num = add(StreamObj(
            {
                Name("Type"): Name("XObject"),
                Name("Subtype"): Name("Image"),
                Name("Width"): w,
                Name("Height"): h,
                Name("ColorSpace"): Name(colorspace),
                Name("BitsPerComponent"): 8,
                Name("Filter"): Name("FlateDecode"),
            },
            zlib.compress(a.tobytes(), 6),
        ))
        pw = w * 72.0 / resolution
        ph = h * 72.0 / resolution
        content = (
            b"q %s 0 0 %s 0 0 cm /Im0 Do Q"
            % (_ser_float(pw)[0:32], _ser_float(ph)[0:32])
        )
        content_num = add(StreamObj({}, content))
        page_nums.append(add({
            Name("Type"): Name("Page"),
            Name("Parent"): Ref(pages_num_placeholder, 0),
            Name("MediaBox"): [0, 0, float(pw), float(ph)],
            Name("Resources"): {
                Name("XObject"): {Name("Im0"): Ref(img_num, 0)}
            },
            Name("Contents"): Ref(content_num, 0),
        }))
    objects[pages_num_placeholder] = {
        Name("Type"): Name("Pages"),
        Name("Kids"): [Ref(n, 0) for n in page_nums],
        Name("Count"): len(page_nums),
    }
    root_num = add({
        Name("Type"): Name("Catalog"),
        Name("Pages"): Ref(pages_num_placeholder, 0),
    })
    return serialize_pdf(objects, root_num)


_LETTER_W = 8.5 * 72.0  # 612 pt — the reference hard-codes letter size
_LETTER_H = 11.0 * 72.0  # 792 pt


def _esc_text(text: str) -> bytes:
    raw = text.encode("cp1252", errors="replace")
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _overlay_stream(words: list[dict], img_w: int, img_h: int) -> bytes:
    """One page's invisible-text content stream.

    Coordinate math is the reference's ``make_page_with_text``
    (doctor/lib/utils.py:317-356) verbatim: tesseract raster coordinates
    scale to a US-letter page (``(8.5*72)/w`` horizontally, ``(11*72)/h``
    vertically), the baseline sits ``sub`` (the scaled word height) below
    the scaled top edge, the font is Helvetica 9.  Invisibility uses both
    mechanisms real OCR layers use: text render mode 3 (``3 Tr``) and a
    zero-alpha ExtGState (reportlab's ``setFillAlpha(0)`` serializes as
    ``/ca 0``)."""
    sx = _LETTER_W / img_w
    sy = _LETTER_H / img_h
    parts = [b"q /GSdsocr gs BT 3 Tr /Fdsocr 9 Tf"]
    for w in words:
        txt = str(w.get("text", ""))
        if not txt:
            continue
        x = sx * int(w.get("left", 0))
        y_top = sy * int(w.get("top", 0))
        sub = sy * int(w.get("height", 0))
        y = _LETTER_H - y_top - sub
        parts.append(
            b"1 0 0 1 %s %s Tm (%s) Tj"
            % (_ser_float(x), _ser_float(y), _esc_text(txt))
        )
    parts.append(b"ET Q")
    return b"\n".join(parts)


def embed_text_overlay(
    data: bytes, pages_words: list[list[dict] | None],
    img_w: int, img_h: int,
) -> bytes:
    """V4 ("embed text", reference views.py:439-474 + utils.py:317-356):
    merge an invisible OCR text layer into an existing PDF.

    The reference rasterizes the PDF, runs tesseract ``image_to_data``,
    draws each word as alpha-0 Helvetica-9 text on a reportlab canvas at
    letter-scaled raster coordinates, and pypdf-merges that overlay onto
    each source page.  Here the same per-word placement is emitted as an
    appended content stream per page (text render mode 3 + ``/ca 0``
    ExtGState), the overlay font/gstate registered in each page's
    resources, and the document re-serialized deterministically.

    ``pages_words`` holds one tesseract-style word table per page (keys
    ``text/left/top/width/height`` — the shape this repo's OCR backends
    return; the reference's flat ``page_num``-keyed dict is the same data
    grouped).  ``img_w``/``img_h`` are the rasterization dimensions the
    word coordinates live in.  Pages whose entry is ``None``/empty keep
    their content untouched.  Extraction tools (this repo's parser
    included, matching pdftotext) still see the invisible text — that is
    the point of the operation."""
    objects = _scan_objects(data)
    if _find_encrypt(data, objects) is not None:
        raise PdfWriteError("encrypted document: refusing lossy rewrite")
    for num, obj in list(objects.items()):
        if type(obj) is _LazyObj:
            _materialize(objects, num, obj)
    order = _page_order(objects)
    if not order:
        raise PdfWriteError("no pages")
    root_num = None
    for num, obj in objects.items():
        if isinstance(obj, dict) and obj.get("Type") == "Catalog":
            root_num = num
            break
    if root_num is None:
        raise PdfWriteError("no document catalog")

    nxt = max(objects) + 1

    def add(obj) -> int:
        nonlocal nxt
        objects[nxt] = obj
        nxt += 1
        return nxt - 1

    font_num = add({
        Name("Type"): Name("Font"),
        Name("Subtype"): Name("Type1"),
        Name("BaseFont"): Name("Helvetica"),
        Name("Encoding"): Name("WinAnsiEncoding"),
    })
    gs_num = add({
        Name("Type"): Name("ExtGState"),
        Name("ca"): 0.0,
        Name("CA"): 0.0,
    })

    for idx, pnum in enumerate(order):
        words = pages_words[idx] if idx < len(pages_words) else None
        if not words:
            continue
        pdict = objects[pnum]
        if not isinstance(pdict, dict):
            continue
        snum = add(StreamObj({}, _overlay_stream(words, img_w, img_h)))
        contents = pdict.get("Contents")
        if isinstance(contents, list):
            contents.append(Ref(snum, 0))
        elif contents is not None:
            pdict[Name("Contents")] = [contents, Ref(snum, 0)]
        else:
            pdict[Name("Contents")] = Ref(snum, 0)
        # page resources: copy the inherited dict down if the page has
        # none of its own (additions must not leak to sibling pages via
        # a Pages-node dict — a shared Ref'd dict is fine, the additions
        # are identical for every page)
        res = pdict.get("Resources")
        if res is None:
            inh = _inherited(pdict, "Resources", objects)
            res_dict = dict(inh) if isinstance(inh, dict) else {}
            pdict[Name("Resources")] = res_dict
        else:
            res_dict = _resolve(res, objects)
            if not isinstance(res_dict, dict):
                res_dict = {}
                pdict[Name("Resources")] = res_dict
        fonts = _resolve(res_dict.get("Font"), objects)
        if not isinstance(fonts, dict):
            fonts = {}
            res_dict[Name("Font")] = fonts
        fonts[Name("Fdsocr")] = Ref(font_num, 0)
        egs = _resolve(res_dict.get("ExtGState"), objects)
        if not isinstance(egs, dict):
            egs = {}
            res_dict[Name("ExtGState")] = egs
        egs[Name("GSdsocr")] = Ref(gs_num, 0)

    keep: dict[int, object] = {}
    for num, obj in objects.items():
        if isinstance(obj, StreamObj) and obj.attrs.get("Type") in (
            "ObjStm", "XRef",
        ):
            continue  # members are promoted; xref is rebuilt classic
        keep[num] = obj
    return serialize_pdf(keep, root_num)


def pdf_from_png_bytes(pngs: list[bytes], resolution: float = 100.0) -> bytes:
    """PNG payloads → PDF via the from-scratch codec (the full V1 path:
    doctor downloads images and PIL-saves them; here decode_png +
    pdf_from_images)."""
    from .png import decode_png

    return pdf_from_images([decode_png(p) for p in pngs], resolution)
