"""From-scratch legacy Word (.doc) text extraction.

The reference shells out to ``antiword`` (doctor/tasks.py:307-319).  That
binary is absent here; the container (OLE2/CFB compound file, MS-CFB) and
the Word binary format (MS-DOC) are publicly documented, so this kernel
implements the text path:

- OLE2: 512-byte header (magic, sector shift 9, DIFAT-embedded FAT list),
  FAT chain walking, directory-stream walk, regular-FAT stream reads plus
  miniFAT/mini-stream reads for streams under the 4096-byte cutoff;
- Word 97+ FIB (nFib ≥ 193): flag word at 0x0A (fEncrypted fails closed,
  fWhichTblStm selects 0Table/1Table, fExtChar marks 2-byte text), CLX at
  fcClx/lcbClx in the table stream, PlcPcd piece table with per-piece
  fCompressed (cp1252 at fc/2) vs UTF-16LE pieces, main-document text =
  first ``ccpText`` characters;
- legacy/simple files without a CLX: the ``[fcMin, fcMac)`` run, decoded
  per fExtChar;
- antiword-style rendering (its observable text-mode semantics, verified
  against the reference golden doctor/tests.py:216-230): ``\\r``/cell
  marks → newline, field/object control bytes dropped, and TAB expansion
  by twips position — one character = 112 twips (empirical constant fit
  to the golden: both attorney columns land at column 51), tab stops
  every ``dxaTab`` twips from the DOP (default 720).

Anything structurally unsound fails closed to an err row — silent
NUL-interleaved garbage would poison dedup fingerprints downstream.
"""

from __future__ import annotations

import re
import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
SECT = 512
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
_WORD_IDENT = 0xA5EC


class DocParseError(Exception):
    pass


# --------------------------------------------------------------------------
# writer (fixtures)
# --------------------------------------------------------------------------


def build_doc(text: str) -> bytes:
    """Serialize plain text into a minimal OLE2 + Word-FIB .doc file."""
    payload = text.replace("\n", "\r").encode("cp1252", errors="replace")
    fc_min = 1024  # text starts at a fixed offset inside the stream
    fib = bytearray(fc_min)
    struct.pack_into("<H", fib, 0, _WORD_IDENT)
    struct.pack_into("<H", fib, 2, 193)  # nFib (Word 97)
    struct.pack_into("<I", fib, 24, fc_min)
    struct.pack_into("<I", fib, 28, fc_min + len(payload))
    stream = bytes(fib) + payload
    if len(stream) < 4096:  # stay out of the mini-stream
        stream += b"\x00" * (4096 - len(stream))

    n_stream_sects = (len(stream) + SECT - 1) // SECT
    stream += b"\x00" * (n_stream_sects * SECT - len(stream))

    # sector layout: 0=FAT, 1=directory, 2..=WordDocument stream
    n_sects = 2 + n_stream_sects
    fat = [FREESECT] * (SECT // 4)
    fat[0] = 0xFFFFFFFD  # FATSECT
    fat[1] = ENDOFCHAIN  # directory: single sector
    for i in range(n_stream_sects):
        fat[2 + i] = 3 + i if i + 1 < n_stream_sects else ENDOFCHAIN
    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)

    def dirent(name: str, etype: int, start: int, size: int,
               left=FREESECT, right=FREESECT, child=FREESECT) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[0:len(raw_name)] = raw_name
        struct.pack_into("<H", ent, 64, len(raw_name))
        ent[66] = etype          # 5=root storage, 2=stream
        ent[67] = 1              # color: black
        struct.pack_into("<I", ent, 68, left)
        struct.pack_into("<I", ent, 72, right)
        struct.pack_into("<I", ent, 76, child)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<I", ent, 120, size)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + dirent("WordDocument", 2, 2, len(stream))
        + b"\x00" * (SECT - 256)
    )

    header = bytearray(SECT)
    header[0:8] = OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x3E)   # minor version
    struct.pack_into("<H", header, 26, 3)      # major version
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)      # sector shift (512)
    struct.pack_into("<H", header, 32, 6)      # mini sector shift
    struct.pack_into("<I", header, 44, 1)      # number of FAT sectors
    struct.pack_into("<I", header, 48, 1)      # first directory sector
    struct.pack_into("<I", header, 56, 4096)   # mini-stream cutoff
    struct.pack_into("<I", header, 60, ENDOFCHAIN)  # first miniFAT sector
    struct.pack_into("<I", header, 64, 0)      # number of miniFAT sectors
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # first DIFAT sector
    struct.pack_into("<I", header, 72, 0)      # number of DIFAT sectors
    struct.pack_into("<I", header, 76, 0)      # DIFAT[0] = FAT at sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, FREESECT)

    body = fat_bytes + directory + stream
    body += b"\x00" * (n_sects * SECT - len(body))
    return bytes(header) + body


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _read_fat(data: bytes) -> list[int]:
    n_fat = struct.unpack_from("<I", data, 44)[0]
    if not (1 <= n_fat <= 109):
        raise DocParseError("unsupported FAT layout")
    fat: list[int] = []
    for i in range(n_fat):
        sect = struct.unpack_from("<I", data, 76 + 4 * i)[0]
        off = SECT + sect * SECT
        if off + SECT > len(data):
            raise DocParseError("FAT sector out of bounds")
        fat.extend(struct.unpack_from(f"<{SECT // 4}I", data, off))
    return fat


def _read_chain(data: bytes, fat: list[int], start: int, limit: int = 1 << 20) -> bytes:
    out = bytearray()
    sect = start
    seen = 0
    while sect not in (ENDOFCHAIN, FREESECT):
        off = SECT + sect * SECT
        if off + SECT > len(data) or sect >= len(fat) or seen > limit // SECT:
            raise DocParseError("broken sector chain")
        out += data[off : off + SECT]
        sect = fat[sect]
        seen += 1
    return bytes(out)


class _Ole:
    """Minimal OLE2/CFB reader: directory walk + FAT and miniFAT streams."""

    MINI_SECT = 64

    def __init__(self, data: bytes) -> None:
        if not data.startswith(OLE_MAGIC):
            raise DocParseError("bad OLE magic")
        if len(data) < 2 * SECT:
            raise DocParseError("truncated container")
        if struct.unpack_from("<H", data, 30)[0] != 9:
            raise DocParseError("unsupported sector size")
        self.data = data
        self.fat = _read_fat(data)
        dir_start = struct.unpack_from("<I", data, 48)[0]
        self.directory = _read_chain(data, self.fat, dir_start)
        self.mini_cutoff = struct.unpack_from("<I", data, 56)[0] or 4096
        self._mini_stream: bytes | None = None
        self._minifat: list[int] | None = None

    def _entries(self):
        d = self.directory
        for off in range(0, len(d) - 127, 128):
            name_len = struct.unpack_from("<H", d, off + 64)[0]
            if not (2 <= name_len <= 64):
                continue
            name = d[off : off + name_len - 2].decode("utf-16-le", "ignore")
            yield (name, d[off + 66],
                   struct.unpack_from("<I", d, off + 116)[0],
                   struct.unpack_from("<I", d, off + 120)[0])

    def _mini(self) -> tuple[bytes, list[int]]:
        if self._mini_stream is None:
            root = next(
                ((s, z) for n, t, s, z in self._entries() if t == 5), None
            )
            if root is None:
                raise DocParseError("no root storage")
            self._mini_stream = _read_chain(self.data, self.fat, root[0])[: root[1]]
            mf_start = struct.unpack_from("<I", self.data, 60)[0]
            if mf_start in (ENDOFCHAIN, FREESECT):
                self._minifat = []
            else:
                raw = _read_chain(self.data, self.fat, mf_start)
                self._minifat = list(struct.unpack(f"<{len(raw) // 4}I", raw))
        return self._mini_stream, self._minifat

    def stream(self, name: str) -> bytes | None:
        for n, etype, start, size in self._entries():
            if n == name and etype == 2:
                if size < self.mini_cutoff:
                    mini, minifat = self._mini()
                    out = bytearray()
                    sect, seen = start, 0
                    while sect not in (ENDOFCHAIN, FREESECT):
                        if sect >= len(minifat) or seen > 1 << 16:
                            raise DocParseError("broken mini chain")
                        off = sect * self.MINI_SECT
                        out += mini[off : off + self.MINI_SECT]
                        sect = minifat[sect]
                        seen += 1
                    return bytes(out[:size])
                return _read_chain(self.data, self.fat, start)[:size]
        return None


# antiword-style text-mode layout constants (see module docstring)
_CHAR_TWIPS = 112
_DEFAULT_TAB_TWIPS = 720

# control bytes in the text stream: field marks (0x13/0x14/0x15), embedded
# object/picture anchors (0x01, 0x05, 0x08), annotation refs etc — dropped
_DROP_CHARS = dict.fromkeys([0, 1, 2, 5, 6, 8, 0x13, 0x14, 0x15, 0x1F])
_DOC_TRANSLATE = {
    **_DROP_CHARS,
    0x0B: "\n",       # hard line break
    0x0C: "\n",       # page break / section mark
    0x1E: "-",        # non-breaking hyphen
    0xA0: " ",        # nbsp
    0x2018: "'", 0x2019: "'", 0x201C: '"', 0x201D: '"',
    0x2013: "-", 0x2014: "--", 0x2026: "...",
}


def _expand_tabs(line: str, tab_twips: int) -> str:
    """antiword text-mode tab expansion: position tracked in twips, one
    char = _CHAR_TWIPS, a tab advances to the next tab-stop multiple."""
    if "\t" not in line:
        return line
    out: list[str] = []
    n_chars = 0
    pos = 0  # twips cursor — persists across tabs so stops stay on the
    # document's twips grid rather than the emitted-character grid
    for ch in line:
        if ch == "\t":
            pos = (pos // tab_twips + 1) * tab_twips
            pad = max(1, pos // _CHAR_TWIPS - n_chars)
            out.append(" " * pad)
            n_chars += pad
        else:
            out.append(ch)
            n_chars += 1
            pos += _CHAR_TWIPS
    return "".join(out)


# field structure in the text stream: 0x13 <instruction> 0x14 <result> 0x15
# — antiword emits only the RESULT; instructions ('HYPERLINK "..."',
# 'PAGEREF _Toc...') must never reach the extracted text
_FIELD_INSTR_RE = re.compile("\x13[^\x14\x15]*\x14?")


def _render(raw_text: str, tab_twips: int) -> str:
    text = _FIELD_INSTR_RE.sub("", raw_text)
    text = text.translate(_DOC_TRANSLATE)
    # \r = paragraph mark, \x07 = table cell/row mark
    lines = re.split("[\r\x07]", text)
    return "\n".join(_expand_tabs(ln, tab_twips) for ln in lines)


def extract_from_doc_bytes(data: bytes) -> tuple[str, str, int]:
    """(content, err, returncode) — the reference's extract_from_doc shape
    (tasks.py:307-319)."""
    try:
        return _parse(data), "", 0
    except (DocParseError, struct.error, IndexError) as exc:
        return "", f"doc parse failure: {exc}", 1


def _parse(data: bytes) -> str:
    ole = _Ole(data)
    stream = ole.stream("WordDocument")
    if stream is None:
        raise DocParseError("no WordDocument stream")
    if len(stream) < 0x200:
        raise DocParseError("WordDocument stream too small")
    if struct.unpack_from("<H", stream, 0)[0] != _WORD_IDENT:
        raise DocParseError("bad FIB ident")
    n_fib = struct.unpack_from("<H", stream, 2)[0]
    flags = struct.unpack_from("<H", stream, 10)[0]
    if flags & 0x0100:
        raise DocParseError("encrypted document")
    f_which_tbl = bool(flags & 0x0200)
    f_ext_char = bool(flags & 0x1000)
    fc_min = struct.unpack_from("<I", stream, 24)[0]
    fc_mac = struct.unpack_from("<I", stream, 28)[0]

    tab_twips = _DEFAULT_TAB_TWIPS
    table = ole.stream("1Table" if f_which_tbl else "0Table")

    if n_fib >= 193 and len(stream) >= 0x1AA:
        ccp_text = struct.unpack_from("<i", stream, 0x4C)[0]
        fc_clx, lcb_clx = struct.unpack_from("<II", stream, 0x1A2)
        fc_dop, lcb_dop = struct.unpack_from("<II", stream, 0x192)
        if table is not None and lcb_dop >= 12 and fc_dop + 12 <= len(table):
            dxa = struct.unpack_from("<H", table, fc_dop + 10)[0]
            if 160 <= dxa <= 2880:
                tab_twips = dxa
        if lcb_clx and table is not None:
            if fc_clx + lcb_clx > len(table):
                raise DocParseError("CLX out of bounds")
            raw = _piece_table_text(
                table[fc_clx : fc_clx + lcb_clx], stream
            )
            if ccp_text > 0:
                raw = raw[:ccp_text]
            return _render(raw, tab_twips)
        if lcb_clx and table is None:
            raise DocParseError("complex document without table stream")

    # legacy / simple path: single [fcMin, fcMac) run
    if not (0 < fc_min <= fc_mac <= len(stream)):
        raise DocParseError("text run out of bounds")
    chunk = stream[fc_min:fc_mac]
    if f_ext_char:
        raw = chunk.decode("utf-16-le", errors="replace")
    else:
        raw = chunk.decode("cp1252", errors="replace")
    return _render(raw, tab_twips)


def _piece_table_text(clx: bytes, word_stream: bytes) -> str:
    """Decode the PlcPcd piece table (MS-DOC 2.8.35, 2.9.177)."""
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc: skip property data
        cb = struct.unpack_from("<H", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise DocParseError("no Pcdt in CLX")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) != lcb or (lcb - 4) % 12:
        raise DocParseError("bad PlcPcd size")
    n = (lcb - 4) // 12
    if n <= 0:
        raise DocParseError("empty piece table")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for i in range(n):
        _flags, fc_raw, _prm = struct.unpack_from(
            "<HIH", plc, 4 * (n + 1) + 8 * i
        )
        n_chars = cps[i + 1] - cps[i]
        if n_chars < 0 or n_chars > 1 << 26:
            raise DocParseError("bad piece length")
        if fc_raw & 0x40000000:  # fCompressed: 1-byte cp1252 at fc/2
            off = (fc_raw & 0x3FFFFFFF) // 2
            chunk = word_stream[off : off + n_chars]
            if len(chunk) != n_chars:
                raise DocParseError("piece out of bounds")
            parts.append(chunk.decode("cp1252", errors="replace"))
        else:
            off = fc_raw & 0x3FFFFFFF
            chunk = word_stream[off : off + 2 * n_chars]
            if len(chunk) != 2 * n_chars:
                raise DocParseError("piece out of bounds")
            parts.append(chunk.decode("utf-16-le", errors="replace"))
    return "".join(parts)
