"""Unit tests for the jusText-dialect boilerplate classifier kernel.

Every expected feature value below is hand-computed from the plain-text
authoring strings (len / split / stopword membership), independently of
the kernel's HTML parsing — the authoring-template golden discipline used
across this repo's fixtures.
"""

import random
import string

import pytest

from doctor_spark.kernels.boilerplate import (
    Block,
    classify_blocks,
    main_content,
    _classify_cf,
    _resolve_context,
)

# A 224-char, stopword-rich paragraph: 43 words, 24 of them in the 24-word
# EN inventory -> stop_milli = 1000*24//43 = 558 > 320, n_chars > 200 -> good.
GOOD_PARA = (
    "the court held that the motion was filed by the party and that the "
    "record of the case was complete for review on appeal because counsel "
    "for the state had argued that the question of law was not settled in "
    "this district court"
)
assert len(GOOD_PARA) == 224 and len(GOOD_PARA.split(" ")) == 43


def test_good_paragraph_features():
    blocks = classify_blocks(f"<html><body><p>{GOOD_PARA}</p></body></html>")
    assert len(blocks) == 1
    b = blocks[0]
    assert b.text == GOOD_PARA
    assert b.n_chars == 224
    assert b.n_words == 43
    stop_hits = sum(
        t in {"and", "are", "as", "at", "be", "but", "by", "for", "from",
              "had", "have", "in", "is", "it", "not", "of", "on", "or",
              "that", "the", "this", "to", "was", "with"}
        for t in GOOD_PARA.split(" "))
    assert b.stop_milli == 1000 * stop_hits // 43 > 320
    assert b.link_milli == 0
    assert b.cf_class == "good" and b.final_class == "good"


def test_link_dense_nav_is_bad():
    html = ('<div id="nav"><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></div>')
    (b,) = classify_blocks(html)
    assert b.text == "Home About Contact"
    assert b.link_milli > 200 and b.cf_class == "bad" and b.final_class == "bad"


def test_copyright_block_is_bad():
    (b,) = classify_blocks("<p>© 2024 Example Corp — " + GOOD_PARA + "</p>")
    assert b.cf_class == "bad"


def test_short_with_links_is_bad_without_links_is_short():
    (b,) = classify_blocks('<p>Read <a href="/x">more</a></p>')
    assert b.n_chars < 70 and b.link_chars > 0 and b.cf_class == "bad"
    (b2,) = classify_blocks("<p>Read more</p>")
    assert b2.cf_class == "short"


def test_neargood_band():
    # 30 words, 10 stopword hits -> 333 milli; 120 chars (<=200) -> neargood
    words = (["the", "court", "on"] * 10)
    text = " ".join(w + "xxx" if i % 3 == 1 else w
                    for i, w in enumerate(words))
    (b,) = classify_blocks(f"<p>{text}</p>")
    assert 300 < b.stop_milli <= 320 or b.cf_class in ("neargood", "bad")
    # construct an exact neargood: stop_milli in (300, 320]
    t2 = " ".join(["the"] * 8 + ["zzzzzzzz"] * 17)  # 8/25 = 320 -> not >320
    (b2,) = classify_blocks(f"<p>{t2}</p>")
    assert b2.n_words == 25 and b2.stop_milli == 320
    t3 = " ".join(["the"] * 8 + ["zzzzzzzzz"] * 17)  # longer words, same ratio
    (b3,) = classify_blocks(f"<p>{t3}</p>")
    assert b3.stop_milli == 320
    # 320 is NOT > 320 -> falls to stopwords_low band -> neargood
    assert b2.cf_class == "neargood" == b3.cf_class


def test_context_resolution_pure():
    # short between two goods -> good; between two bads -> bad
    assert _resolve_context(["good", "short", "good"]) == \
        ["good", "good", "good"]
    assert _resolve_context(["bad", "short", "bad"]) == ["bad", "bad", "bad"]
    # neargood next to any good -> good; between bads -> bad
    assert _resolve_context(["bad", "neargood", "good"]) == \
        ["bad", "good", "good"]
    assert _resolve_context(["bad", "neargood", "bad"]) == \
        ["bad", "bad", "bad"]
    # short with mixed {good,bad} neighbours -> bad unless a neargood sits
    # between the short block and its bad-side neighbour
    assert _resolve_context(["good", "short", "bad"]) == \
        ["good", "bad", "bad"]
    assert _resolve_context(["good", "short", "neargood", "bad"]) == \
        ["good", "good", "good", "bad"]
    # edges default to bad
    assert _resolve_context(["short"]) == ["bad"]
    assert _resolve_context(["neargood"]) == ["bad"]
    assert _resolve_context(["short", "good"]) == ["bad", "good"]


def test_skip_subtrees_contribute_nothing():
    html = ("<html><head><title>T</title><style>p{color:red}</style></head>"
            "<body><script>var x='<p>nope</p>';</script>"
            f"<p>{GOOD_PARA}</p>"
            "<noscript><p>off</p></noscript></body></html>")
    blocks = classify_blocks(html)
    assert [b.text for b in blocks] == [GOOD_PARA]


def test_br_does_not_split_div_does():
    html = "<div>alpha<br>beta</div><div>gamma</div>"
    assert [b.text for b in classify_blocks(html)] == ["alpha beta", "gamma"]


def test_entities_and_whitespace_normalization():
    (b,) = classify_blocks("<p>  a&amp;b\t\n &lt;c&gt; </p>")
    assert b.text == "a&b <c>"


def test_main_content_joins_good_blocks():
    html = (f'<div><a href="/">Home</a> <a href="/b">B</a></div>'
            f"<p>{GOOD_PARA}</p><p>Short tail.</p>"
            f"<p>{GOOD_PARA}</p><div>© 2024</div>")
    # short tail sits between two goods -> kept
    assert main_content(html) == "\n".join([GOOD_PARA, "Short tail.",
                                            GOOD_PARA])


def test_empty_blocks_dropped_and_empty_html():
    assert classify_blocks("") == []
    assert classify_blocks("<div></div><p>   </p>") == []


def test_cf_truth_table():
    # (n_chars, link_chars, link_milli, stop_milli, has_c) -> class
    assert _classify_cf(100, 0, 201, 0, False) == "bad"
    assert _classify_cf(100, 0, 200, 0, False) == "bad"   # low stopwords
    assert _classify_cf(100, 0, 0, 0, True) == "bad"
    assert _classify_cf(69, 0, 0, 999, False) == "short"
    assert _classify_cf(69, 1, 14, 999, False) == "bad"
    assert _classify_cf(201, 0, 0, 321, False) == "good"
    assert _classify_cf(200, 0, 0, 321, False) == "neargood"
    assert _classify_cf(100, 0, 0, 301, False) == "neargood"
    assert _classify_cf(100, 0, 0, 300, False) == "bad"


def test_tag_soup_never_raises():
    rng = random.Random(42)
    alphabet = string.ascii_letters + " <>/=\"'&;#!-" + "pdivbr"
    for _ in range(300):
        soup = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 400)))
        blocks = classify_blocks(soup)
        for b in blocks:
            assert isinstance(b, Block)
            assert b.final_class in ("good", "bad")
            assert b.n_chars == len(b.text) > 0


def test_unclosed_script_swallows_rest():
    blocks = classify_blocks("<p>keep</p><script>var x=1; <p>lost</p>")
    assert [b.text for b in blocks] == ["keep"]


def test_fixture_catalog_recovered():
    """The kernel must recover the hand-authored block catalog (text and
    link chars) from the fixture HTML exactly — this is the glue between
    the HTML-parsing path and the oracle's literal VALUES."""
    from doctor_spark.kernels.boilerplate_fixtures import BLOCKS, PAGES

    got = [(url, i, b.text, b.link_chars)
           for url in PAGES
           for i, b in enumerate(classify_blocks(PAGES[url]))]
    assert got == list(BLOCKS)


def test_fixture_branch_coverage():
    """The fixture set must keep exercising every classification branch:
    assert the catalog's context-free class census."""
    from collections import Counter

    from doctor_spark.kernels.boilerplate_fixtures import BLOCKS, PAGES

    cf = Counter()
    for url in PAGES:
        for b in classify_blocks(PAGES[url]):
            cf[b.cf_class] += 1
    assert cf["good"] >= 3 and cf["bad"] >= 5
    assert cf["short"] >= 4 and cf["neargood"] >= 3
    assert sum(cf.values()) == len(BLOCKS) == 17


def test_operator_accepts_binary_html(spark):
    """The input-table contract carries ``html: binary`` — both operators
    must classify a bytes payload identically to its string form, and
    poison payloads (NULL, invalid utf-8) must yield rows, not deaths."""
    from doctor_spark.kernels.boilerplate_fixtures import PAGES
    from doctor_spark.operators.boilerplate import (
        justext_blocks,
        justext_doc_summary,
    )

    url, html = sorted(PAGES.items())[0]
    rows = [
        ("b", html.encode("utf-8")),
        ("junk", b"\xff\xfe<p>still \xff parsed</p>"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    sdf = spark.createDataFrame([("s", html)], "url string, html string")
    got = {r["url"]: r for r in justext_doc_summary(df).collect()}
    got.update({r["url"]: r for r in justext_doc_summary(sdf).collect()})
    assert got["s"].asDict() == {**got["b"].asDict(), "url": "s"}
    assert got["junk"]["n_blocks"] >= 1 and got["null"]["n_blocks"] == 0

    counts = {r["url"]: r["count"]
              for r in justext_blocks(df.where("url = 'b'"))
              .unionByName(justext_blocks(sdf))
              .groupBy("url").count().collect()}
    assert counts["s"] == counts["b"] == 4


# -- span-lineage variant ----------------------------------------------------


def test_span_twin_parity_on_fixture_pages():
    """classify_block_spans must agree with classify_blocks on every
    hand-authored fixture page (text, link_chars, both classes) — the two
    parsers differ only in charref bookkeeping, never in segmentation."""
    from doctor_spark.kernels.boilerplate import (
        classify_block_spans,
        classify_blocks,
    )
    from doctor_spark.kernels.boilerplate_fixtures import PAGES

    for url, html in sorted(PAGES.items()):
        a = [(b.text, b.link_chars, b.cf_class, b.final_class)
             for b in classify_blocks(html)]
        c = [(b.text, b.link_chars, b.cf_class, b.final_class)
             for b in classify_block_spans(html)]
        assert a == c, url


def test_span_slice_invariant():
    """The raw source slice html[start:end], unescaped and whitespace-
    normalized, must reproduce the block text — entities count at SOURCE
    length, so the slice is the exact provenance region."""
    import html as html_mod
    import re

    from doctor_spark.kernels.boilerplate import _WS_RE, classify_block_spans
    from doctor_spark.kernels.boilerplate_fixtures import PAGES

    def norm(s: str) -> str:
        return " ".join(p for p in _WS_RE.split(s) if p)

    pages = list(sorted(PAGES.items()))
    pages.append(("ent", "<p>A &amp; B &#60;ok&#x3E; &copy; &amp C</p>"))
    for url, html in pages:
        for b in classify_block_spans(html):
            raw = html[b.start:b.end]
            # strip any tags inside the span (inline <a>/<b> etc.), then
            # unescape: that is exactly what the segmenter accumulated
            text = norm(html_mod.unescape(re.sub(r"<[^>]*>", " ", raw)))
            assert norm(b.text) == text, (url, b.start, b.end, raw)


def test_span_entity_edge_forms():
    """Entity/charref source spans: terminated refs span name+2, bare
    ampersands and unterminated legacy refs keep convert_charrefs
    semantics (html.unescape of the reconstructed source)."""
    from doctor_spark.kernels.boilerplate import classify_block_spans

    html = "<p>x &amp; y</p><p>&#65;&#x42;</p><p>5 &lt 6 now</p>"
    blocks = classify_block_spans(html)
    texts = [(b.text, html[b.start:b.end]) for b in blocks]
    assert texts[0] == ("x & y", "x &amp; y")
    assert texts[1] == ("AB", "&#65;&#x42;")
    # '&lt' without ';' is the legacy form html.unescape maps to '<'
    assert texts[2][0] == "5 < 6 now"


def test_span_skip_subtrees_and_br():
    """script/style content contributes neither text nor span; <br>
    renders as whitespace with no source span of its own."""
    from doctor_spark.kernels.boilerplate import classify_block_spans

    html = ("<p>before<script>var x = '<p>no</p>';</script>after</p>"
            "<p>one<br>two</p>")
    blocks = classify_block_spans(html)
    assert [b.text for b in blocks] == ["beforeafter", "one two"]
    b0, b1 = blocks
    assert html[b0.start:b0.end].startswith("before")
    assert html[b0.start:b0.end].endswith("after")
    assert html[b1.start:b1.end] == "one<br>two"


def test_justext_spans_operator(spark):
    """Operator contract: per-block span rows, binary html accepted,
    poison payload yields zero rows (not a task death)."""
    from doctor_spark.operators.boilerplate import justext_spans

    html = '<div>Alpha</div><p>x &amp; y</p>'
    df = spark.createDataFrame(
        [("a", html.encode("utf-8")), ("n", None)], "url string, html binary"
    )
    rows = {(r["url"], r["block_id"]): r for r in justext_spans(df).collect()}
    assert set(rows) == {("a", 0), ("a", 1)}
    assert html[rows[("a", 0)]["start_off"]:rows[("a", 0)]["end_off"]] == "Alpha"
    assert html[rows[("a", 1)]["start_off"]:rows[("a", 1)]["end_off"]] == "x &amp; y"
    assert rows[("a", 1)]["n_chars"] == 5
    assert not rows[("a", 1)]["kept"]
