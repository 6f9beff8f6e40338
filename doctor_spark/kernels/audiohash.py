"""Perceptual audio fingerprinting — pure integer numpy, deterministic.

The audio rung of the dedup ladder (re-encoded, re-gained, or
lightly-noised copies of the same clip should collide), built like the
image dHash: an ENERGY-ENVELOPE gradient hash.

afp64:

1. mono: integer channel mean (``sum // n_channels``);
2. envelope: split the sample stream into 65 equal frames with
   ``floor(i*n/65)`` boundaries; frame energy = sum of absolute sample
   values (int64-exact — no windows, no floats, no FFT);
3. bit i = 1 iff ``energy[i+1] > energy[i]`` — 64 temporal gradient
   comparisons, MSB first, returned as a SIGNED int64.

Gain invariance: scaling every sample by a positive constant scales all
frame energies together, leaving every comparison — hence the hash —
unchanged (the audio analog of dHash's brightness invariance).  Small
additive noise moves each frame's MEAN |sample| by less than typical
frame-to-frame contrast.  Resampling approximately preserves the
per-time-window envelope, so moderate rate changes keep most bits —
that residual is what the Hamming-banded join absorbs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["afp64"]

_FRAMES = 65  # 64 comparisons


def afp64(samples: np.ndarray) -> int:
    """int16 samples, shaped (n,) or (n, channels) → 64-bit fingerprint
    as a signed Python int."""
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s.astype(np.int64).sum(axis=1) // s.shape[1]
    else:
        s = s.astype(np.int64)
    n = s.shape[0]
    if n < 1:
        raise ValueError("empty audio")
    mag = np.abs(s)
    bounds = (np.arange(_FRAMES + 1, dtype=np.int64) * n) // _FRAMES
    if n >= _FRAMES:
        csum = np.concatenate(([0], np.cumsum(mag)))
        sums = csum[bounds[1:]] - csum[bounds[:-1]]
        counts = bounds[1:] - bounds[:-1]
        energy = sums // counts
    else:
        # degenerate short clip: nearest-neighbor sample per frame
        idx = (np.arange(_FRAMES, dtype=np.int64) * n) // _FRAMES
        energy = mag[idx]
    bits = energy[1:] > energy[:-1]
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val
