"""Porter stemmer — clean-room implementation of the suffix-stripping
algorithm from M. F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980 (the original 5-step definition, not Porter2).

A corpus pipeline stems for index conflation (BM25/postings vocabulary
folding), decontamination probes that must match benchmark answers
across inflections, and keyword rollups.  The algorithm is pure
per-token string work — it runs inside Arrow-batched UDFs and its cost
is O(token length), so the Spark-side concern is only batch shape.

Semantics implemented exactly as published: the measure m counts VC
sequences in the [C](VC)^m[V] decomposition, ``y`` is a vowel iff
preceded by a consonant (and a consonant word-initially), each step
takes the LONGEST matching suffix and then tests that rule's condition
(failing the condition ends the step — shorter suffixes are NOT
retried), and words of length <= 2 are returned unchanged.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] decomposition."""
    n = len(stem)
    i = 0
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant where the final consonant is
    not w, x or y."""
    n = len(w)
    return (
        n >= 3
        and _is_cons(w, n - 3)
        and not _is_cons(w, n - 2)
        and _is_cons(w, n - 1)
        and w[-1] not in "wxy"
    )


def _longest(w: str, rules):
    """First rule whose suffix matches (rules listed longest-first):
    returns (suffix, replacement, cond) or None."""
    for suf, rep, cond in rules:
        if w.endswith(suf):
            return suf, rep, cond
    return None


_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("biliti", "ble"),
    ("tional", "tion"), ("ation", "ate"), ("alism", "al"),
    ("aliti", "al"), ("iviti", "ive"), ("entli", "ent"),
    ("ousli", "ous"), ("anci", "ance"), ("enci", "ence"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("ator", "ate"), ("eli", "e"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ion", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic", "ou",
]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    hit = _longest(w, [(s, r, None) for s, r in _STEP2])
    if hit is not None:
        suf, rep, _ = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 3
    hit = _longest(w, [(s, r, None) for s, r in _STEP3])
    if hit is not None:
        suf, rep, _ = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 4
    hit = _longest(w, [(s, "", None) for s in _STEP4])
    if hit is not None:
        suf, _, _ = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 1 and (
            suf != "ion" or (stem and stem[-1] in "st")
        ):
            w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
