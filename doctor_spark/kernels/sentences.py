"""Sentence segmentation — the stage between document extraction and
sentence-level processing (CCNet-style line/sentence dedup, sequence
packing, per-sentence quality gates).

No reference counterpart: doctor stops at document text
(lib/text_extraction.py); a training-data pipeline needs sentence
boundaries next.  The rules are a small deterministic spec, not a
trained model, so every decision is unit-testable and the driver
oracle can replay expected outputs exactly:

- a boundary is a terminal run ``[.!?]+`` plus any closing
  quotes/brackets ``["')\\]]*``, followed by whitespace, followed by an
  opener (uppercase letter, digit, or opening quote/bracket);
- a PERIOD-only terminal run is suppressed when the word before it is
  a known abbreviation (``Mr.``, ``Dr.``, ``e.g.``, ``Fig.``, ...) —
  the guard never applies to ``!``/``?`` runs;
- decimals (``3.14``) never split — the boundary requires whitespace
  after the terminal run;
- text after the last boundary is a final sentence if non-empty;
  sentences are stripped, empties dropped; ``None`` → ``[]``.
"""

from __future__ import annotations

import re

# Common English abbreviations whose trailing period is not a sentence
# boundary.  Case-sensitive on purpose: "no." as a word is a boundary,
# "No. 7" is a citation.  Dotted forms ("e.g", "i.e", "U.S") compare
# against the token with its INTERNAL dots kept.
ABBREVIATIONS = frozenset(
    "Mr Mrs Ms Dr Prof St Jr Sr vs etc al e.g i.e cf No Inc Ltd Co "
    "Corp Fig Vol Rev Gen Adm Sen Rep Gov U.S".split()
)

_BOUNDARY = re.compile(r"([.!?]+[\"')\]]*)\s+(?=[A-Z0-9\"'(\[])")
_LAST_WORD = re.compile(r"(\S+)\Z")
_OPEN_STRIP = "\"'([{"


def _is_abbreviation(before: str) -> bool:
    m = _LAST_WORD.search(before)
    if not m:
        return False
    return m.group(1).lstrip(_OPEN_STRIP) in ABBREVIATIONS


def split_sentences(text: str | None) -> list[str]:
    """Split ``text`` into stripped, non-empty sentences per the module
    rules.  Pure function over the public spec; any garbage input is a
    one-sentence (or empty) result, never a raise."""
    if text is None:
        return []
    out: list[str] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        if m.group(1).startswith(".") and "." == m.group(1).rstrip(
            "\"')]"
        ) and _is_abbreviation(text[start:m.start(1)]):
            continue
        out.append(text[start:m.end(1)].strip())
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return [s for s in out if s]


def sentence_stats_row(text: str | None) -> tuple[int, int, int]:
    """(n_sentences, sum_chars, max_chars) over the split — the per-doc
    rollup the ``sentence_stats`` driver query emits."""
    parts = split_sentences(text)
    if not parts:
        return 0, 0, 0
    lens = [len(s) for s in parts]
    return len(parts), sum(lens), max(lens)
