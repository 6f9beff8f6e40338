"""Gale–Church sentence alignment — the bead extraction step of a
bitext-mining pass (ParaCrawl/CCAligned-style): given the sentence
character lengths of two parallel pages, find the minimum-cost monotone
alignment into beads of type 1-1 / 1-0 / 0-1 / 2-1 / 1-2 / 2-2.

No reference counterpart: doctor stops at document text
(lib/text_extraction.py); a multilingual training-data pipeline mines
sentence pairs next, and ``hreflang_pairs`` (operators/metadata.py)
already inventories WHICH page pairs to align — this kernel aligns one
pair.

The algorithm and constants are the published ones (Gale & Church,
"A Program for Aligning Sentences in Bilingual Corpora",
Computational Linguistics 19(1), 1993; same constants as NLTK's
``nltk.translate.gale_church``):

- character-count model: a source text of length ``l1`` generates a
  target of length ``l2`` with ``delta = (l2 - l1*c) /
  sqrt(((l1 + l2/c)/2) * s2)`` approximately standard normal, with
  ``c = 1.0`` (expected chars-per-char) and ``s2 = 6.8`` (variance per
  character);
- bead match cost ``-100 * ln(2 * (1 - Phi(|delta|)))`` (two-tailed),
  floored probability so pathological lengths stay finite;
- bead-type penalties (``-100 * ln(prior/prior_11)``): 1-1 → 0,
  2-1 / 1-2 → 230, 2-2 → 440, 1-0 / 0-1 → 450.

Everything is deterministic: costs are pure ``math`` over ints, the DP
tie-break is a fixed move order, and the output is bead INDEX
structure only (no float column leaves the kernel), so the driver
oracle can replay expected beads as literals.
"""

from __future__ import annotations

import math

# published Gale-Church constants
_C = 1.0          # expected target chars per source char
_S2 = 6.8         # per-character variance of the length model
_MIN_PROB = 1e-12  # cost floor: -100*ln(1e-12) ~ 2763, finite

# bead-type penalty, -100*ln(prior/prior_1_1) rounded as in the
# original C program / NLTK
_PENALTY = {
    (1, 1): 0.0,
    (2, 1): 230.0,
    (1, 2): 230.0,
    (2, 2): 440.0,
    (1, 0): 450.0,
    (0, 1): 450.0,
}

# fixed move order = deterministic tie-break (first strictly-better
# predecessor wins; on exact cost ties the earlier move is kept)
_MOVES = ((1, 1), (1, 0), (0, 1), (2, 1), (1, 2), (2, 2))

# DP table guard: pages are sentence-bounded in practice; a pair whose
# n*m exceeds this is reported as unaligned (ok=False) by the operator
# rather than silently truncated.
MAX_CELLS = 250_000


def _norm_sf(z: float) -> float:
    """Two-tailed tail probability 2*(1 - Phi(|z|)) = erfc(|z|/sqrt 2)."""
    return math.erfc(abs(z) / math.sqrt(2.0))


def bead_cost(l1: int, l2: int, di: int, dj: int) -> float:
    """Cost of one bead aligning ``l1`` source chars (``di`` sentences)
    with ``l2`` target chars (``dj`` sentences)."""
    penalty = _PENALTY[(di, dj)]
    if l1 == 0 and l2 == 0:
        return penalty
    mean = (l1 + l2 / _C) / 2.0
    delta = (l2 - l1 * _C) / math.sqrt(mean * _S2)
    prob = _norm_sf(delta)
    if prob < _MIN_PROB:
        prob = _MIN_PROB
    return penalty - 100.0 * math.log(prob)


def gale_church_align(
    src_lens: list[int], tgt_lens: list[int], max_cells: int = MAX_CELLS
) -> list[tuple[int, int, int, int]] | None:
    """Minimum-cost monotone alignment of the two sentence-length
    sequences.  Returns beads ``(src_start, n_src, tgt_start, n_tgt)``
    in document order, or ``None`` when the DP table would exceed
    ``max_cells`` (the caller flags the pair unaligned — never a
    silent truncation)."""
    n, m = len(src_lens), len(tgt_lens)
    if (n + 1) * (m + 1) > max_cells:
        return None
    if n == 0 and m == 0:
        return []
    # prefix sums: sum(src_lens[a:b]) == ps[b] - ps[a]
    ps = [0]
    for v in src_lens:
        ps.append(ps[-1] + v)
    pt = [0]
    for v in tgt_lens:
        pt.append(pt[-1] + v)

    inf = float("inf")
    width = m + 1
    dist = [inf] * ((n + 1) * width)
    back: list[tuple[int, int] | None] = [None] * ((n + 1) * width)
    dist[0] = 0.0
    for i in range(n + 1):
        base = i * width
        for j in range(m + 1):
            if i == 0 and j == 0:
                continue
            best = inf
            arg: tuple[int, int] | None = None
            for di, dj in _MOVES:
                pi, pj = i - di, j - dj
                if pi < 0 or pj < 0:
                    continue
                prev = dist[pi * width + pj]
                if prev == inf:
                    continue
                c = prev + bead_cost(
                    ps[i] - ps[pi], pt[j] - pt[pj], di, dj
                )
                if c < best:
                    best = c
                    arg = (di, dj)
            dist[base + j] = best
            back[base + j] = arg

    # backtrace
    beads: list[tuple[int, int, int, int]] = []
    i, j = n, m
    while i > 0 or j > 0:
        mv = back[i * width + j]
        if mv is None:  # unreachable by construction, defensive
            return None
        di, dj = mv
        i -= di
        j -= dj
        beads.append((i, di, j, dj))
    beads.reverse()
    return beads
