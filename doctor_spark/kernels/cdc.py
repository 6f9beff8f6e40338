"""Content-defined chunking — the gear-rolling-hash core of FastCDC
(Xia et al., USENIX ATC 2016) with a fixed cut mask, the storage-level
dedup primitive: chunk boundaries follow CONTENT, so an insertion
shifts only the chunks it touches and identical regions of different
payloads (mirrored pages, re-crawled captures, templated binaries)
produce identical chunk hashes without any alignment.

Determinism: the 256-entry gear table derives from md5 of the byte
value — no RNG, identical on every machine and engine; the fingerprint
recurrence is pure 64-bit integer arithmetic

    fp = ((fp << 1) + gear[b]) mod 2^64

with a cut after byte i when ``fp & CUT_MASK == 0`` (fingerprint reset
at each chunk start), a minimum size gating early cuts and a maximum
size forcing one.  This is the plain gear-CDC loop; FastCDC's
normalized-chunking refinement (two masks) is a parameter change, not
a shape change.
"""

from __future__ import annotations

import hashlib

_MASK64 = (1 << 64) - 1

GEAR = tuple(
    int.from_bytes(hashlib.md5(bytes([i])).digest()[:8], "big")
    for i in range(256)
)


def chunk_payload(
    data: bytes,
    min_size: int = 32,
    max_size: int = 256,
    mask: int = 0x7F,
) -> list[tuple[int, int, str]]:
    """[(offset, length, md5hex)] — content-defined chunks of ``data``.
    Average chunk size ~ (mask + 1) bytes past ``min_size``."""
    out = []
    n = len(data)
    start = 0
    fp = 0
    i = 0
    while i < n:
        fp = ((fp << 1) + GEAR[data[i]]) & _MASK64
        size = i - start + 1
        if (size >= min_size and (fp & mask) == 0) or size >= max_size:
            out.append(
                (start, size, hashlib.md5(data[start:i + 1]).hexdigest())
            )
            start = i + 1
            fp = 0
        i += 1
    if start < n:
        out.append(
            (start, n - start, hashlib.md5(data[start:]).hexdigest())
        )
    return out
