"""C4 cleaning stages (operators/c4.py): line-retention rules, page
poison gates, corpus-level n-line-span dedup — behavior, pure-Python
differential on a hostile corpus, and the plan contracts (line filter
zero-exchange/zero-Python; span dedup exactly three exchanges with no
page text on the span stream)."""

import re

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.c4 import (
    MIN_LINE_WORDS,
    TERMINAL_PUNCT,
    c4_line_filter,
    c4_span_dedup,
)
from doctor_spark.plans.checks import count_exchanges, physical_plan

# ---------------------------------------------------------------------------
# pure-Python reference implementations (independent of the Column code)

_TRIM = re.compile(r"^[ \t]+|[ \t]+$")


def _ref_line_kept(ln: str, min_words: int = MIN_LINE_WORDS) -> bool:
    t = _TRIM.sub("", ln)
    words = [w for w in t.split(" ") if w]
    return (
        t[-1:] in TERMINAL_PUNCT
        and len(words) >= min_words
        and "javascript" not in t.lower()
    )


def _ref_line_filter(text: str | None, banned=()):
    text = text or ""
    lines = text.split("\n")
    kept = [_TRIM.sub("", ln) for ln in lines if _ref_line_kept(ln)]
    low = text.lower()
    toks = set(re.split(r"[ \t\n\x0b\f\r]", low)) - {""}
    if "lorem ipsum" in low:
        reason = "lorem_ipsum"
    elif "{" in text:
        reason = "brace"
    elif toks & set(banned):
        reason = "banned_word"
    elif len(kept) < 3:
        reason = "too_few_lines"
    else:
        reason = None
    return len(lines), len(kept), reason, "\n".join(kept)


def _ref_span_dedup(docs: dict[int, str | None], n: int = 3):
    """first-occurrence-keeps span dedup, ordered by (doc_id, start)."""
    occ: dict[str, list[tuple[int, int]]] = {}
    lines = {d: (t or "").split("\n") for d, t in docs.items()}
    for d in sorted(lines):
        nl = [_TRIM.sub("", x) for x in lines[d]]
        for s in range(1, len(nl) - n + 2):
            occ.setdefault("\n".join(nl[s - 1:s - 1 + n]), []).append((d, s))
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for hits in occ.values():
        if len(hits) > 1:
            for d, s in sorted(hits)[1:]:
                removed[d].update(range(s, s + n))
    out = {}
    for d, ls in lines.items():
        keep = [ln for i, ln in enumerate(ls, 1) if i not in removed[d]]
        out[d] = (len(ls), len(removed[d]), "\n".join(keep))
    return out


# ---------------------------------------------------------------------------


HOSTILE = [
    (1, "The quick brown fox jumps over the dog.\nshort line.\n"
        "Enable javascript to view this site now.\n"
        "Another perfectly good sentence lives right here!\n"
        'A third quoted line ends like this one does."\nno terminal punct'),
    (2, "Lorem Ipsum dolor sit amet and so forth today.\n"
        "A good long sentence number one stands here.\n"
        "A good long sentence number two stands here.\n"
        "A good long sentence number three stands here."),
    (3, "var x = { key: 1 };\nA good long sentence number one stands here.\n"
        "A good long sentence number two stands here.\n"
        "A good long sentence number three stands here."),
    (4, None),
    (5, ""),
    (6, "   \t padded line with five words inside it.   \n"
        "Tabs\tinside\tdo\tnot\tsplit words, spaces do.\n"
        "A JavaScript mention in mixed case kills this line.\n"
        "One more good line to clear the minimum bar.\n"
        "And a final good line to be safe here."),
    (7, "An unsafeword token appears right here in this line.\n"
        "A good long sentence number one stands here.\n"
        "A good long sentence number two stands here.\n"
        "A good long sentence number three stands here."),
    (8, "Ends with bang and five words at least!\n"
        "Ends with question and five words at least?\n"
        "Ends with period and five words at least."),
]


def test_line_filter_differential(spark):
    df = spark.createDataFrame(HOSTILE, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["drop_reason"],
                      r["cleaned_text"], r["page_ok"])
        for r in c4_line_filter(df, banned_words=("unsafeword",)).collect()
    }
    for d, t in HOSTILE:
        n_lines, n_kept, reason, cleaned = _ref_line_filter(
            t, banned=("unsafeword",))
        assert got[d] == (n_lines, n_kept, reason, cleaned, reason is None), d


def test_line_filter_rules(spark):
    df = spark.createDataFrame(HOSTILE, "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in c4_line_filter(df, banned_words=("unsafeword",))
            .collect()}
    assert rows[1]["page_ok"] and rows[1]["n_kept"] == 3
    assert rows[2]["drop_reason"] == "lorem_ipsum"
    assert rows[3]["drop_reason"] == "brace"
    assert rows[4]["drop_reason"] == "too_few_lines"
    assert rows[7]["drop_reason"] == "banned_word"
    # trimming: the padded line survives and is emitted trimmed
    assert rows[6]["cleaned_text"].startswith("padded line")
    # the mixed-case JavaScript line is dropped
    assert "JavaScript" not in rows[6]["cleaned_text"]
    assert rows[8]["n_kept"] == 3 and rows[8]["page_ok"]


SPAN_DOCS = {
    10: "shared a\nshared b\nshared c\nunique ten",
    11: "lead line\nshared a\nshared b\nshared c\ntail line",
    12: "shared a\nshared b\nshared c",
    13: "one\ntwo",
    14: None,
    15: "  shared a \nshared b\n\tshared c\nspaced copy",  # trim-normalized hit
    16: "self dup x\nself dup y\nself dup z\nmid\nself dup x\nself dup y\n"
        "self dup z",  # within-doc duplicate span
}


def test_span_dedup_differential(spark):
    df = spark.createDataFrame(
        sorted(SPAN_DOCS.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_removed"], r["cleaned_text"])
           for r in c4_span_dedup(df).collect()}
    assert got == _ref_span_dedup(SPAN_DOCS)


def test_span_dedup_semantics(spark):
    df = spark.createDataFrame(
        sorted(SPAN_DOCS.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_span_dedup(df).collect()}
    # first occurrence (min doc_id) keeps the shared block
    assert got[10]["n_removed"] == 0
    assert got[11]["cleaned_text"] == "lead line\ntail line"
    assert got[12]["cleaned_text"] == ""
    # trim-normalized lines hash equal -> doc 15's copy is removed too
    assert got[15]["n_removed"] == 3
    assert got[15]["cleaned_text"] == "spaced copy"
    # within-doc duplicate: the SECOND occurrence goes
    assert got[16]["cleaned_text"] == "self dup x\nself dup y\nself dup z\nmid"
    # short pages emit no spans and survive untouched
    assert got[13]["n_removed"] == 0 and got[13]["cleaned_text"] == "one\ntwo"
    assert got[14]["cleaned_text"] == ""


def test_line_filter_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame(HOSTILE, "doc_id long, text string")
    plan = physical_plan(c4_line_filter(df, banned_words=("unsafeword",)))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_plan_three_exchanges_no_text_on_span_stream(spark):
    df = spark.createDataFrame(
        sorted(SPAN_DOCS.items()), "doc_id long, text string")
    q = c4_span_dedup(df)
    plan = physical_plan(q)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # hash window + removed-set agg + corpus join: no fourth exchange
    assert count_exchanges(q) <= 3, plan
    # the span-side exchange partitions on the hash, never on the text
    assert "hashpartitioning(h#" in plan, plan


@pytest.mark.parametrize("n", [2, 4])
def test_span_dedup_other_widths(spark, n):
    docs = {
        1: "a one\nb two\nc three\nd four",
        2: "z\na one\nb two\nc three\nd four\nq",
    }
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_removed"], r["cleaned_text"])
           for r in c4_span_dedup(df, n=n).collect()}
    assert got == _ref_span_dedup(docs, n=n)
