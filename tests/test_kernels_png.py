"""From-scratch PNG codec: round trips over every supported color type,
all five scanline filters, palette expansion, fail-closed validation, and
the golden thumbnail contract over real PNG payloads."""

import struct
import zlib

import numpy as np
import pytest

from doctor_spark.kernels.png import (
    PNG_SIGNATURE,
    PngError,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Grayscale encoder applying one specific filter to every scanline —
    exercises decode paths the filter-0 encoder never emits."""
    h, w = arr.shape
    rows = []
    prev = np.zeros(w, dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for y in range(h):
        cur = arr[y]
        if ftype == 0:
            enc = cur.astype(np.int16)
        elif ftype == 1:
            enc = cur.astype(np.int16).copy()
            enc[1:] -= cur[:-1].astype(np.int16)
        elif ftype == 2:
            enc = cur.astype(np.int16) - prev
        elif ftype == 3:
            enc = np.empty(w, dtype=np.int16)
            for i in range(w):
                a = int(cur[i - 1]) if i >= 1 else 0
                enc[i] = int(cur[i]) - ((a + int(prev[i])) >> 1)
        else:
            enc = np.empty(w, dtype=np.int16)
            for i in range(w):
                a = int(cur[i - 1]) if i >= 1 else 0
                c = int(prev[i - 1]) if i >= 1 else 0
                enc[i] = int(cur[i]) - paeth(a, int(prev[i]), c)
        rows.append(bytes([ftype]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


class TestPngCodec:
    def test_roundtrip_all_color_types(self):
        rng = np.random.default_rng(1)
        for shape in [(5, 7), (8, 8, 3), (4, 6, 4), (3, 3, 2), (1, 1)]:
            a = rng.integers(0, 256, size=shape, dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(a)), a), shape

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_five_filters_decode(self, ftype):
        rng = np.random.default_rng(ftype + 10)
        img = rng.integers(0, 256, size=(16, 13), dtype=np.uint8)
        assert np.array_equal(decode_png(_encode_with_filter(img, ftype)), img)

    def test_palette_expansion(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(6, 9), dtype=np.uint8)
        ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 3, 0, 0, 0)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
        p = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(p), pal[idx])

    def test_fail_closed(self):
        good = encode_png(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(PngError):
            decode_png(b"not a png at all")
        # flip one IDAT payload byte: CRC must catch it
        i = good.index(b"IDAT") + 6
        with pytest.raises(PngError):
            decode_png(good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1:])
        with pytest.raises(PngError):
            decode_png(good[:40])  # truncated
        # 16-bit depth: unsupported, must refuse not garble
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        p = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError):
            decode_png(p)

    def test_truncated_inside_crc_is_png_error(self):
        """A PNG cut off INSIDE a chunk's 4-byte CRC (body present, CRC
        missing) must raise PngError, not escape as struct.error — the
        media_features operator only maps ValueError to the null-feature
        err row, so anything else kills the Spark task."""
        good = encode_png(np.zeros((4, 4), dtype=np.uint8))
        for cut in (1, 2, 3, 4):  # strip 1..4 trailing CRC bytes of IEND
            with pytest.raises(PngError):
                decode_png(good[:-cut])
        # ...and mid-file: cut inside the IHDR chunk's CRC specifically
        ihdr_end = good.index(b"IHDR") + 4 + 13 + 4  # type+body+crc
        with pytest.raises(PngError):
            decode_png(good[:ihdr_end - 2])

    def test_decompression_bomb_rejected_before_inflate(self):
        """Hostile IHDR dimensions must be rejected BEFORE zlib inflates
        anything: a ~1 MB IDAT at 1000:1 would otherwise demand gigabytes."""
        # 65536 x 65536 gray = 4G pixels, over the 64M cap
        ihdr = struct.pack(">IIBBBBB", 65536, 65536, 8, 0, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * (1 << 20), 9)  # highly compressible
        p = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="too large"):
            decode_png(p)
        # zero-dimension guard
        ihdr0 = struct.pack(">IIBBBBB", 0, 4, 8, 0, 0, 0, 0)
        p0 = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr0)
            + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError):
            decode_png(p0)

    def test_idat_overrun_rejected(self):
        """An IDAT stream inflating PAST the IHDR-declared image size is
        malformed: refuse (bounded decompressobj) rather than buffer it."""
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray
        # declared size = 2*(2+1)=6 bytes; provide 64k of filtered data
        p = (
            PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 65536))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="past IHDR"):
            decode_png(p)

    def test_ancillary_chunks_skipped(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        good = encode_png(a)
        # splice a tEXt chunk between IHDR and IDAT
        i = good.index(b"IDAT") - 4
        spliced = good[:i] + _chunk(b"tEXt", b"Comment\x00hi") + good[i:]
        assert np.array_equal(decode_png(spliced), a)


class TestPngThumbnailGolden:
    def test_resize_golden_over_real_png(self, spark):
        """image_resize over a REAL PNG payload must equal the exact
        nearest-neighbor reference computed directly on the pixels (the
        reference's 350-max-dimension thumbnail contract)."""
        from doctor_spark.operators.multimodal import (
            decode_image_any,
            image_resize,
        )

        rng = np.random.default_rng(42)
        px = rng.integers(0, 256, size=(60, 90, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image", bytearray(encode_png(px)))],
            "media_id long, kind string, payload binary",
        )
        row = image_resize(df, max_dim=30).collect()[0]
        assert (row.width, row.height) == (30, 20)
        got = decode_image_any(bytes(row.thumbnail))
        # exact nearest-neighbor golden
        yi = (np.arange(20) * (60 / 20)).astype(int)
        xi = (np.arange(30) * (90 / 30)).astype(int)
        assert np.array_equal(got, px[yi][:, xi])
