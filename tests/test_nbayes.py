"""Naive Bayes trainer: reference differential (pure-Python model with
the same quantization), tie determinism, and the no-token exclusion."""

import math
from collections import Counter, defaultdict

import pytest

from doctor_spark.operators.nbayes import nb_confusion


def ref_confusion(rows):
    MICRO = 1_000_000

    def ml(x):
        return math.floor(math.log10(x) * MICRO + 0.5)

    def toks(t):
        import re
        return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t.strip(" ").lower()) if w]

    cnt = defaultdict(Counter)
    ndocs = Counter()
    vocab = set()
    for _i, lab, t in rows:
        ndocs[lab] += 1
        for w in toks(t):
            cnt[lab][w] += 1
            vocab.add(w)
    V = len(vocab)
    tot = {l: sum(c.values()) for l, c in cnt.items()}
    labels = sorted(ndocs)
    total_docs = sum(ndocs.values())
    conf = Counter()
    for _i, lab, t in rows:
        ws = toks(t)
        if not ws:
            continue
        best = None
        for l in labels:
            s = ml(ndocs[l] / total_docs)
            for w in ws:
                c = cnt[l].get(w)
                if c:
                    s += ml((c + 1) / (tot[l] + V))
                else:
                    s += ml(1 / (tot[l] + V))
            if best is None or s > best[0] or (s == best[0] and l < best[1]):
                best = (s, l)
        conf[(lab, best[1])] += 1
    return dict(conf)


@pytest.mark.parametrize(
    "rows",
    [
        # separable classes + one ambiguous doc + a whitespace-only doc
        [
            (0, "en", "the cat sat on the mat"),
            (1, "en", "the dog and the cat"),
            (2, "de", "der hund und die katze"),
            (3, "de", "die katze auf der matte"),
            (4, "en", "und the"),          # ambiguous mix
            (5, "de", "   \t "),           # no tokens: excluded
        ],
        # tie-bait: symmetric classes, identical likelihoods → label ASC
        [
            (0, "aa", "x y"),
            (1, "bb", "x y"),
            (2, "aa", "z"),
            (3, "bb", "z"),
        ],
    ],
)
def test_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["lang"], r["predicted"]): r["n"]
        for r in nb_confusion(df).collect()
    }
    assert got == ref_confusion(rows)
