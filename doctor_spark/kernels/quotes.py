"""Quotation-span extraction — quoted passages with source offsets.

A memorization/contamination audit wants the VERBATIM quoted material
in a corpus (news quotes, opinion citations, song lyrics inside
reviews): quoted spans are the text most likely to recur across
documents and most sensitive to reproduce.  This kernel pulls every
quoted span with its source character offsets so the span table can
join the dedup/decontamination machinery downstream.

Deterministic spec (the contract the oracle and tests replay):

- Quote pairs: straight ``"…"`` (toggle semantics — an unmatched
  trailing opener yields no span) and typographic ``“…”``
  (must close with the matching curly close; a straight quote never
  closes a curly opener or vice versa).  Pairs do not nest; inside an
  open quote only its own closer is special.
- A span's text is the material BETWEEN the delimiters; offsets
  ``[start, end)`` index the delimiters' positions in the source
  string (start = opener index, end = index AFTER the closer), so
  ``text[start+1:end-1]`` is the quote body.
- Only spans whose body has at least ``min_tokens`` whitespace tokens
  are kept (drops scare quotes and inch marks).
- Spans are emitted in document order.  None/blank input → no spans.

O(len) single pass; run as an Arrow batch per partition by the
operator (operators/quotes.py).
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")

_PAIRS = {'"': '"', "“": "”"}


def _ntok(s: str) -> int:
    s = s.strip()
    return len(_WS.split(s)) if s else 0


def extract_quotes(
    text: str | None, min_tokens: int = 3
) -> list[tuple[int, int, str]]:
    """``[(start, end, body), ...]`` per the module spec."""
    if not text:
        return []
    out: list[tuple[int, int, str]] = []
    opener: str | None = None
    start = -1
    for i, ch in enumerate(text):
        if opener is None:
            if ch in _PAIRS:
                opener, start = ch, i
        elif ch == _PAIRS[opener]:
            body = text[start + 1 : i]
            if _ntok(body) >= min_tokens:
                out.append((start, i + 1, body))
            opener, start = None, -1
    return out
