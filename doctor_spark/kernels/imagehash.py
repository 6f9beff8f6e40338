"""Perceptual image hashing (dHash) — pure integer numpy, deterministic.

Near-duplicate IMAGES are the multimodal counterpart of MinHash/SimHash
text dedup: re-encoded, resized, or lightly-edited copies of the same
picture share a 64-bit gradient hash, so exact-hash grouping (or
Hamming-banded joins, the SimHash machinery) collapses them.  LAION-style
corpus builds run exactly this stage.

dHash (difference hash, the classic 64-bit variant):

1. grayscale: integer channel mean (``sum // n_channels``);
2. block-average downsample to an 8-row x 9-column grid with
   ``floor(i*H/8)`` / ``floor(j*W/9)`` boundaries (each cell an integer
   mean ``sum // count`` — no floats anywhere, so the hash is
   bit-reproducible across platforms);
3. bit (r, c) = 1 iff ``cell[r, c+1] > cell[r, c]`` — 8x8 = 64 horizontal
   gradient comparisons, packed row-major, MSB first.

The gradient form is what makes it *perceptual*: uniform brightness and
contrast changes shift all cells together and leave every comparison —
hence the hash — unchanged; small noise perturbs cell means by less than
typical neighbor contrast.  Returned as a SIGNED int64 (two's complement)
so the value lands in a Spark/DuckDB BIGINT exactly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dhash64", "hamming64"]


def _gray(pixels: np.ndarray) -> np.ndarray:
    """uint8 (h, w) or (h, w, c) → int64 grayscale (h, w); an alpha
    channel (c = 2 or 4) is ignored — transparency is not luminance."""
    if pixels.ndim == 2:
        return pixels.astype(np.int64)
    c = pixels.shape[2]
    color = pixels[:, :, : 3 if c >= 3 else 1].astype(np.int64)
    return color.sum(axis=2) // color.shape[2]


def dhash64(pixels: np.ndarray) -> int:
    """uint8 image array → 64-bit dHash as a signed Python int."""
    g = _gray(pixels)
    h, w = g.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    # integer block-average to 8 x 9 via a cumulative-sum table: cell sums
    # are exact, then floor-divide by the cell pixel count
    rows = (np.arange(9, dtype=np.int64) * h) // 8
    cols = (np.arange(10, dtype=np.int64) * w) // 9
    # guard degenerate dims (h < 8 or w < 9 make empty cells): fall back
    # to nearest-neighbor sampling so every cell has ≥1 pixel
    if np.any(np.diff(rows) < 1) or np.any(np.diff(cols) < 1):
        ri = (np.arange(8, dtype=np.int64) * h) // 8
        ci = (np.arange(9, dtype=np.int64) * w) // 9
        cells = g[np.ix_(ri, ci)]
    else:
        integral = np.zeros((h + 1, w + 1), dtype=np.int64)
        integral[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
        sums = (
            integral[rows[1:, None], cols[None, 1:]]
            - integral[rows[:-1, None], cols[None, 1:]]
            - integral[rows[1:, None], cols[None, :-1]]
            + integral[rows[:-1, None], cols[None, :-1]]
        )
        counts = (rows[1:, None] - rows[:-1, None]) * (
            cols[None, 1:] - cols[None, :-1]
        )
        cells = sums // counts
    bits = (cells[:, 1:] > cells[:, :-1]).ravel()  # 8 x 8, row-major
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's complement into signed int64
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two signed-int64 hashes."""
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def vhash64(frames: np.ndarray) -> int:
    """uint8 frame stack (n, h, w) → 64-bit video fingerprint: the dHash
    of the integer temporal-mean frame.  Frame-order permutations,
    uniform re-timing, and per-frame noise that cancels in the mean all
    leave the hash unchanged — the cheap-and-robust video analog of the
    image hash (per-frame dHashing + the Hamming join handles harder
    edits)."""
    f = np.asarray(frames)
    if f.ndim != 3 or f.shape[0] < 1:
        raise ValueError("expected a (n_frames, h, w) stack")
    mean = f.astype(np.int64).sum(axis=0) // f.shape[0]
    return dhash64(mean)
