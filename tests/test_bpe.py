"""BPE trainer differentials: the distributed trainer vs an independent
pure-Python reference (index-walk LTR, Counter-based — deliberately NOT
the fold the operator uses), on corpora engineered for the failure
modes: overlapping-run counting ('aaaa'), tie-breaks, multi-char
symbols re-merging, and rank-order apply equivalence."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.bpe import (
    END,
    SEP,
    bpe_apply_udf,
    bpe_train,
    encode_word,
    merge_syms,
    word_counts,
)


# ---------------------------------------------------------------- reference
def ref_train(freqs: dict[str, int], n_merges: int):
    """Independent implementation: explicit index-walk LTR merge and
    Counter pair stats."""
    words = {tuple(list(w) + [END]): c for w, c in freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best = min(
            stats.items(),
            key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1]),
        )
        (left, right), freq = best
        merges.append((rank, left, right, freq))
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges, words


def tokenize_text(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower())
            if w and SEP not in w]


@pytest.mark.parametrize(
    "texts",
    [
        # overlapping runs and self-merges
        ["aaaa aaa aa a", "aaaa aaaa baba", "abab baba aaaa"],
        # tie-bait: equal counts force the concat-key ordering
        ["xy xy yz yz", "zz zz", "xy yz zz"],
        # multi-char growth: merged symbols must keep merging
        ["the the the then them theme", "there therefore the them"],
        # multibyte code points: Spark split('') must agree with list()
        ["héé héé héo 漢字 漢字漢 ßß ßß", "héé 漢字 ßß ßo"],
    ],
)
def test_trainer_matches_independent_reference(spark, texts, tmp_path):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    freqs = Counter(w for t in texts for w in tokenize_text(t))
    expect, _ = ref_train(dict(freqs), 12)
    got = bpe_train(word_counts(df), 12)
    assert got == expect


def test_trainer_matches_reference_randomized(spark):
    rng = random.Random(99)
    alphabet = "abcde"
    texts = []
    for _ in range(40):
        words = []
        for _ in range(rng.randrange(3, 12)):
            n = rng.randrange(1, 7)
            words.append("".join(rng.choice(alphabet) for _ in range(n)))
        texts.append(" ".join(words))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    freqs = Counter(w for t in texts for w in tokenize_text(t))
    expect, ref_words = ref_train(dict(freqs), 25)
    got = bpe_train(word_counts(df), 25)
    assert got == expect

    # rank-order application reproduces the trainer's final segmentation
    tok = bpe_apply_udf(got)
    out = (
        df.select(F.explode(tok(F.col("text"))).alias("t"))
        .groupBy("t").count().collect()
    )
    applied = Counter({r["t"]: r["count"] for r in out})
    final = Counter()
    for syms, c in ref_words.items():
        for s in syms:
            final[s] += c
    assert applied == final


def test_fold_equals_index_walk_merge():
    rng = random.Random(5)
    for _ in range(300):
        syms = [rng.choice(["a", "b", "ab", "aa"])
                for _ in range(rng.randrange(1, 10))]
        left = rng.choice(["a", "b", "ab", "aa"])
        right = rng.choice(["a", "b", "ab", "aa"])
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert merge_syms(SEP.join(syms), left, right) == SEP.join(out), (
            syms, left, right)


def test_encode_word_unicode():
    assert encode_word("héo") == SEP.join(["h", "é", "o", END])
