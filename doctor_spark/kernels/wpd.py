"""From-scratch WordPerfect (WPD) text extraction.

The reference shells out to ``wpd2html`` then strips the HTML
(doctor/tasks.py:410-433).  That binary is absent here; WordPerfect 6.x is
a documented format (WPC magic, prefix header with a document-area
pointer, text bytes interleaved with function codes), so this kernel
implements the text-bearing subset:

- header: ``\\xffWPC`` magic, u32-LE document-area offset at byte 4,
  product type 1 / file type 10 (WP document), u16 encryption key (must be
  0 — encrypted docs are rejected);
- document area: printable bytes verbatim; 0x80 (soft space) and 0xA9
  (dashed-space family) → space; 0xCC/0xD0-prefixed hard returns → newline;
  other single-byte function codes (0x81-0xBF) dropped; fixed-length
  multi-byte function groups (0xC0-0xFF) skipped conservatively via a size
  table, falling back to scan-for-matching-close (WP6 groups repeat the
  leading byte at the end).

Scope mirrors the PDF kernel's: exact for documents this module's own
writer produces (the corpus contract), best-effort tolerant elsewhere —
header validation fails closed so junk bytes yield an err row, never
garbage text.
"""

from __future__ import annotations

import struct

MAGIC = b"\xffWPC"

# single-byte function codes that represent whitespace (0xA9 is the hard
# hyphen and renders as '-'; 0xAA is a soft hyphen at line end — joins)
_SPACE_BYTES = frozenset((0x80,))
_HARD_RETURN = 0xCC


class WpdParseError(Exception):
    pass


def build_wpd(text: str) -> bytes:
    """Fixture writer: serialize plain text into the WP6-shaped profile the
    parser reads (spaces as 0x80 soft spaces, newlines as 0xCC hard
    returns, a 16-byte prefix header)."""
    doc_start = 16
    header = (
        MAGIC
        + struct.pack("<I", doc_start)
        + bytes([1, 10])          # product type 1, file type 10 (document)
        + bytes([2, 0])           # major/minor version
        + struct.pack("<H", 0)    # encryption key: none
        + struct.pack("<H", 0)    # index-area pointer (unused here)
    )
    body = bytearray()
    for ch in text:
        if ch == "\n":
            body.append(_HARD_RETURN)
        elif ch == " ":
            body.append(0x80)
        else:
            raw = ch.encode("cp1252", errors="replace")
            b = raw[0]
            body.append(b if 0x20 <= b <= 0x7E else 0x3F)
    return bytes(header) + bytes(body)


def extract_from_wpd_bytes(data: bytes) -> tuple[str, str, int]:
    """(content, err, returncode) — the reference's extract_from_wpd shape
    (tasks.py:410-433)."""
    try:
        text = _parse(data)
        return text, "", 0
    except WpdParseError as exc:
        return "", f"wpd parse failure: {exc}", 1


def _parse(data: bytes) -> str:
    if not data.startswith(MAGIC):
        raise WpdParseError("bad magic")
    if len(data) < 16:
        raise WpdParseError("truncated header")
    (doc_start,) = struct.unpack_from("<I", data, 4)
    product, ftype = data[8], data[9]
    (enc,) = struct.unpack_from("<H", data, 12)
    if product != 1 or ftype != 10:
        raise WpdParseError(f"not a WP document (product={product}, type={ftype})")
    if enc != 0:
        raise WpdParseError("encrypted document")
    if not (16 <= doc_start <= len(data)):
        raise WpdParseError("document-area pointer out of bounds")

    out: list[str] = []
    pos = doc_start
    n = len(data)
    while pos < n:
        b = data[pos]
        if 0x20 <= b <= 0x7E:
            out.append(chr(b))
            pos += 1
        elif b in _SPACE_BYTES:
            out.append(" ")
            pos += 1
        elif b == 0xA9:  # hard hyphen
            out.append("-")
            pos += 1
        elif b == 0xAA:  # soft hyphen: invisible join point
            pos += 1
        elif b == _HARD_RETURN:
            out.append("\n")
            pos += 1
        elif b == 0xCF:  # soft return: a wrapped line joins with a space
            out.append(" ")
            pos += 1
        elif 0xC0 <= b <= 0xCB and pos + 3 < n and (
            close := data.find(bytes([b]), pos + 1, pos + 8)
        ) != -1:
            # fixed-length multi-byte group 0xC0-0xCB (code-terminated,
            # ≤ 8 bytes): 0xC0 is the extended character
            # [C0, char, charset, C0] — its payload bytes must never leak
            # into the text.  An unframed byte falls through as a single.
            if b == 0xC0 and close == pos + 3:
                out.append(_extended_char(data[pos + 2], data[pos + 1]))
            pos = close + 1
        elif b < 0x20 or b <= 0xCF:
            pos += 1  # other single-byte function codes (0x80-0xCF): drop
        elif 0xD0 <= b <= 0xEF and pos + 4 <= n:
            # WP6 variable-length group: [code, subgroup, u16 size, ...,
            # code] — size counts the whole group and the code byte
            # repeats at the end; payload bytes may equal the code, so
            # the size field is authoritative (close-byte scanning leaks
            # payload into the text)
            sub = data[pos + 1]
            size = struct.unpack_from("<H", data, pos + 2)[0]
            end = pos + size
            if size >= 5 and end <= n and data[end - 1] == b:
                if b == 0xD0:  # EOL group: line/cell/paragraph breaks
                    out.append(" " if sub in (0x00, 0x01, 0x02) else "\n")
                elif b == 0xE0:  # tab group (stop position in payload)
                    out.append("\t")
                pos = end
            else:  # malformed: fall back to bounded close-byte scan
                close = data.find(bytes([b]), pos + 1, pos + 64)
                pos = close + 1 if close != -1 else pos + 1
        else:
            # fixed-length multi-byte group 0xF0-0xFF: code-terminated,
            # always short; 0xF0 is an extended character
            # [F0, char, charset, F0]; 0xF2/0xF3 are 3-byte attribute
            # on/off pairs
            if b == 0xF0 and pos + 3 < n and data[pos + 3] == 0xF0:
                out.append(_extended_char(data[pos + 2], data[pos + 1]))
                pos += 4
            elif b in (0xF2, 0xF3) and pos + 2 < n and data[pos + 2] == b:
                pos += 3
            else:
                close = data.find(bytes([b]), pos + 1, pos + 16)
                pos = close + 1 if close != -1 else pos + 1
    return "".join(out)


# WP extended characters (charset, char) → text, for the sets that occur
# in legal documents (WP6 charset 4 = typographic symbols)
_EXT_CHARS = {
    (4, 28): "'", (4, 29): "'", (4, 30): "'",
    (4, 31): '"', (4, 32): '"',
    (4, 33): "-", (4, 34): "-",   # en/em dash
    (4, 0): "•", (4, 2): "□", (4, 5): "¶", (4, 6): "§",
    (4, 17): "™", (4, 22): "®", (4, 23): "©",
    (4, 41): "“", (4, 42): "”",
}


def _extended_char(charset: int, char: int) -> str:
    return _EXT_CHARS.get((charset, char), "")
