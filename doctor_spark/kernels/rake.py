"""RAKE keyword extraction (Rose et al. 2010) — deterministic spec.

Rapid Automatic Keyword Extraction: candidate phrases are maximal runs
of content words between stopwords/punctuation; each word scores
``deg(w)/freq(w)`` (degree = total length of candidate phrases it
appears in, with multiplicity); a phrase scores the sum of its words'
scores.  The original is corpus-free and per-document — exactly the
shape an embarrassingly-parallel Spark map stage wants.

Deterministic spec (every rule replayable):

- text is lowercased; sentence fragments split on runs of
  ``.!?,;:()[]"`` plus newlines;
- a fragment splits into whitespace tokens; a token is a CONTENT word
  iff ``str.isalpha()`` and not in the stopword set (the repo's
  English inventory by default);
- a candidate phrase is a maximal run of consecutive content words
  (length capped at ``max_phrase`` words — longer runs are split,
  RAKE's standard guard against stopword-free rambles);
- scores stay integer: ``word_score_micro = deg(w) * 1e6 // freq(w)``;
  ``phrase_score_micro`` sums them; a phrase is scored ONCE per
  distinct phrase string per document (classic RAKE), its count kept;
- output: distinct phrases ranked by (score desc, phrase asc),
  top ``k``.
"""

from __future__ import annotations

import re
from collections import Counter

from doctor_spark.functions.text import LANG_STOPWORDS

_FRAGMENT_SPLIT = re.compile(r'[.!?,;:()\[\]"\n\r]+')
_WS = re.compile(r"\s+")

DEFAULT_STOPWORDS = frozenset(LANG_STOPWORDS["en"])


def rake_keywords(
    text: str | None,
    top_k: int = 10,
    max_phrase: int = 4,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
) -> list[tuple[str, int, int, int]]:
    """``[(phrase, score_micro, n_words, n_occurrences)]`` ranked by
    (score desc, phrase asc), at most ``top_k`` rows."""
    if not text:
        return []
    phrases: list[tuple[str, ...]] = []
    for frag in _FRAGMENT_SPLIT.split(text.lower()):
        run: list[str] = []
        for tok in _WS.split(frag):
            if tok and tok.isalpha() and tok not in stopwords:
                run.append(tok)
                if len(run) == max_phrase:
                    phrases.append(tuple(run))
                    run = []
            else:
                if run:
                    phrases.append(tuple(run))
                run = []
        if run:
            phrases.append(tuple(run))
    if not phrases:
        return []
    freq: Counter[str] = Counter()
    deg: Counter[str] = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    scored: dict[str, tuple[int, int, int]] = {}
    counts: Counter[str] = Counter(" ".join(p) for p in phrases)
    for p in set(phrases):
        s = sum(deg[w] * 1_000_000 // freq[w] for w in p)
        key = " ".join(p)
        scored[key] = (s, len(p), counts[key])
    ranked = sorted(
        scored.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:top_k]
    return [(k, s, n, c) for k, (s, n, c) in ranked]
