"""From-scratch legacy Word (.doc) text extraction.

The reference shells out to ``antiword`` (doctor/tasks.py:307-319).  That
binary is absent here; the container (OLE2/CFB compound file, MS-CFB) and
the Word binary format's simple case (MS-DOC FIB with an ``fcMin..fcMac``
text run in the ``WordDocument`` stream) are both publicly documented, so
this kernel implements exactly that subset:

- OLE2: 512-byte header (magic, sector shift 9, DIFAT-embedded FAT list),
  FAT chain walking, directory-stream walk to find the ``WordDocument``
  entry, regular-FAT stream reads (the writer pads streams past the 4096-
  byte mini-stream cutoff so the miniFAT never applies);
- Word FIB: ``wIdent`` 0xA5EC magic, text run ``[fcMin, fcMac)`` decoded
  as cp1252 with Word's ``\\r`` paragraph marks mapped to newlines.

Complex-format documents (piece tables, fastsaved files, Unicode pieces)
are out of this subset and fail closed to an err row — like the PDF and
WPD kernels, exactness is defined against this module's own fixture
writer, tolerance against the wild is fail-closed.
"""

from __future__ import annotations

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


def extract_from_doc_bytes(data: bytes) -> tuple[str, str, int]:
    """(content, err, returncode) — the reference's extract_from_doc shape
    (tasks.py:307-319)."""
    try:
        return _parse(data), "", 0
    except (DocParseError, struct.error) as exc:
        return "", f"doc parse failure: {exc}", 1


def _parse(data: bytes) -> str:
    if not data.startswith(OLE_MAGIC):
        raise DocParseError("bad OLE magic")
    if len(data) < 2 * SECT:
        raise DocParseError("truncated container")
    if struct.unpack_from("<H", data, 30)[0] != 9:
        raise DocParseError("unsupported sector size")
    fat = _read_fat(data)
    dir_start = struct.unpack_from("<I", data, 48)[0]
    directory = _read_chain(data, fat, dir_start)

    stream_start = stream_size = None
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        if not (2 <= name_len <= 64):
            continue
        name = directory[off : off + name_len - 2].decode("utf-16-le", "ignore")
        if name == "WordDocument" and directory[off + 66] == 2:
            stream_start = struct.unpack_from("<I", directory, off + 116)[0]
            stream_size = struct.unpack_from("<I", directory, off + 120)[0]
            break
    if stream_start is None:
        raise DocParseError("no WordDocument stream")
    if stream_size < 32:
        raise DocParseError("WordDocument stream too small")
    stream = _read_chain(data, fat, stream_start)[:stream_size]

    if struct.unpack_from("<H", stream, 0)[0] != _WORD_IDENT:
        raise DocParseError("bad FIB ident")
    fc_min = struct.unpack_from("<I", stream, 24)[0]
    fc_mac = struct.unpack_from("<I", stream, 28)[0]
    if not (0 < fc_min <= fc_mac <= len(stream)):
        raise DocParseError("text run out of bounds (complex format?)")
    text = stream[fc_min:fc_mac].decode("cp1252", errors="replace")
    return text.replace("\r", "\n").replace("\x07", "\n")
