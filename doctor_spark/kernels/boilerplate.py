"""jusText-dialect boilerplate / main-content block classifier (from scratch).

Implements the block-level main-content extraction algorithm Common-Crawl
pipelines run on raw HTML (Pomikalek 2011, "Removing boilerplate and
duplicate content from web corpora" — the published jusText algorithm),
re-expressed as a pure, order-independent function so the context stage is
replayable by SQL window functions on any engine.

Reference semantics anchor: the doctor reference strips boilerplate with a
fixed tag blacklist (doctor/lib/html.py via lxml Cleaner); this module is
the *statistical* stage a web-corpus pipeline adds on top — classify each
block-level text run as ``good`` (main content) or ``bad`` (boilerplate)
from link density, stopword density, and length, then resolve ``short`` /
``neargood`` blocks from their neighbours.

Dialect notes (deliberate divergences from the jusText reference
implementation, chosen for cross-engine exactness — each is a contract,
not an accident):

- Densities are integer-quantized to milli units (``(1000*x)//n``) so the
  classification thresholds compare int64s on both engines; thresholds are
  jusText's defaults (max_link_density 0.2 -> 200, length_low 70,
  length_high 200, stopwords_low 0.30 -> 300, stopwords_high 0.32 -> 320),
  all strict ``>`` / ``<`` exactly as written below.
- The context-sensitive stage reads ONLY context-free classes (a pure
  two-pass algorithm).  jusText mutates classes in document order while
  revising, so later blocks can see earlier *revised* classes; the pure
  form is order-independent, hence expressible as window functions
  (``last_value IGNORE NULLS`` over preceding rows) and identical under
  any partitioning.
- Stopwords are the repo's 24-word English inventory
  (functions/text.py:LANG_STOPWORDS['en']), not jusText's per-language
  lists; tokens are the Java-``\\s``-class split of ``lower(text)`` used
  by every other oracle in this repo.
- Paragraph boundaries: a fixed block-level tag set (below); ``<br>`` does
  not split; ``script/style/head/template/noscript/svg/select/option``
  subtrees contribute no text.  Blocks whose normalized text is empty are
  dropped (they get no row and no vote in the context stage).

Everything is stdlib-only and a pure function of the HTML string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape as _unescape
from html.parser import HTMLParser

from ..functions.text import LANG_STOPWORDS

# jusText default thresholds, integer-quantized (milli densities).
MAX_LINK_MILLI = 200      # link_density 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOP_LOW_MILLI = 300      # stopword_density 0.30
STOP_HIGH_MILLI = 320     # stopword_density 0.32

EN_STOPWORDS = frozenset(LANG_STOPWORDS["en"])

# Tags that terminate the current text block (HTML block-level elements).
BLOCK_TAGS = frozenset(
    "address article aside blockquote body caption center dd div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr "
    "html legend li main menu nav ol p pre section table tbody td tfoot "
    "th thead tr ul".split()
)

# Subtrees that contribute no text at all.
SKIP_TAGS = frozenset(
    "head iframe noscript option script select style svg template title".split()
)

# Void elements never get pushed on the skip stack (no closing tag).
_VOID = frozenset("area base br col embed hr img input link meta source "
                  "track wbr".split())

_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _norm(raw: str) -> str:
    """Whitespace-normalize with the Java-\\s class (not str.split, which
    also splits on Unicode spaces the JVM/DuckDB oracles do not)."""
    return " ".join(p for p in _WS_RE.split(raw) if p)


@dataclass
class Block:
    """One block-level text run with its classification features."""
    text: str
    n_chars: int
    n_words: int
    link_chars: int
    link_milli: int
    stop_milli: int
    cf_class: str          # context-free: good | bad | short | neargood
    final_class: str = ""  # context-sensitive: good | bad


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []          # raw text pieces, current block
        self._link_parts: list[str] = []     # pieces inside <a>
        self._a_depth = 0
        self._skip_depth = 0
        self.blocks: list[tuple[str, int]] = []  # (normalized text, link_chars)

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        text = _norm("".join(self._parts))
        link = _norm("".join(self._link_parts))
        self._parts.clear()
        self._link_parts.clear()
        if text:
            self.blocks.append((text, len(link)))

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS and tag not in _VOID:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "br":  # line break renders as whitespace, not a glue
            self._parts.append(" ")
            self._link_parts.append(" ")
        if tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "br":
            self._parts.append(" ")
            self._link_parts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS and tag not in _VOID:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_parts.append(data)
        else:
            # keep link/non-link runs separated so _norm never merges a
            # link fragment with adjacent plain text
            self._link_parts.append(" ")

    def close(self) -> None:  # final implicit block
        super().close()
        self._flush()


def _classify_cf(n_chars: int, link_chars: int, link_milli: int,
                 stop_milli: int, has_copyright: bool) -> str:
    """Context-free jusText classification on integer milli densities."""
    if link_milli > MAX_LINK_MILLI:
        return "bad"
    if has_copyright:
        return "bad"
    if n_chars < LENGTH_LOW:
        return "bad" if link_chars > 0 else "short"
    if stop_milli > STOP_HIGH_MILLI:
        return "good" if n_chars > LENGTH_HIGH else "neargood"
    if stop_milli > STOP_LOW_MILLI:
        return "neargood"
    return "bad"


def _neighbour(classes: list[str], i: int, step: int, with_neargood: bool) -> str:
    """Nearest context-free class in {good,bad} (+neargood when asked),
    walking from block i in direction step; 'bad' past either edge."""
    want = ("good", "bad", "neargood") if with_neargood else ("good", "bad")
    j = i + step
    while 0 <= j < len(classes):
        if classes[j] in want:
            return classes[j]
        j += step
    return "bad"


def _resolve_context(classes: list[str]) -> list[str]:
    """Pure two-pass context resolution over context-free classes."""
    out = []
    for i, c in enumerate(classes):
        if c in ("good", "bad"):
            out.append(c)
            continue
        prev_gb = _neighbour(classes, i, -1, False)
        next_gb = _neighbour(classes, i, +1, False)
        if c == "neargood":
            out.append("bad" if (prev_gb == "bad" and next_gb == "bad")
                       else "good")
            continue
        # short
        if prev_gb == "good" and next_gb == "good":
            out.append("good")
        elif prev_gb == "bad" and next_gb == "bad":
            out.append("bad")
        elif (prev_gb == "bad"
              and _neighbour(classes, i, -1, True) == "neargood") or \
             (next_gb == "bad"
              and _neighbour(classes, i, +1, True) == "neargood"):
            out.append("good")
        else:
            out.append("bad")
    return out


def stopwords_for(lang: str | None) -> frozenset:
    """Per-language stopword inventory (jusText ships one per language);
    unknown / script-routed languages fall back to English — documented:
    the CJK/Arabic/etc. gate needs a different signal than stopword
    density, and a wrong-language inventory fails CLOSED (low density →
    bad), never keeps boilerplate."""
    ws = LANG_STOPWORDS.get(lang or "en")
    return frozenset(ws) if ws is not None else EN_STOPWORDS


def classify_blocks(html: str, stopwords: frozenset = EN_STOPWORDS,
                    ) -> list[Block]:
    """Segment ``html`` into block-level text runs and classify each as
    main content (``good``) or boilerplate (``bad``).

    Never raises on tag soup: HTMLParser is non-validating, and every
    downstream step is pure arithmetic on the recovered text runs.
    """
    seg = _Segmenter()
    seg.feed(html)
    seg.close()

    blocks: list[Block] = []
    for text, link_chars in seg.blocks:
        n_chars = len(text)
        toks = text.lower().split(" ")
        n_words = len(toks)
        stop_hits = sum(t in stopwords for t in toks)
        link_milli = (1000 * link_chars) // n_chars if n_chars else 0
        stop_milli = (1000 * stop_hits) // n_words if n_words else 0
        cf = _classify_cf(n_chars, link_chars, link_milli, stop_milli,
                          "©" in text)
        blocks.append(Block(text=text, n_chars=n_chars, n_words=n_words,
                            link_chars=link_chars, link_milli=link_milli,
                            stop_milli=stop_milli, cf_class=cf))

    finals = _resolve_context([b.cf_class for b in blocks])
    for b, f in zip(blocks, finals):
        b.final_class = f
    return blocks


def main_content(html: str) -> str:
    """The kept main content: good blocks joined by newlines."""
    return "\n".join(b.text for b in classify_blocks(html)
                     if b.final_class == "good")


# ---------------------------------------------------------------------------
# Span-lineage variant: the same block segmentation, but every block also
# carries its [start, end) SOURCE character offsets in the original HTML
# string — the "extracted text/spans per document" artifact a provenance-
# aware extraction tier writes next to the text (re-highlighting, audit,
# incremental re-extraction all key on it).  Reference anchor: the doctor
# reference returns extracted text only (doctor/lib/html.py); spans are the
# lineage web-corpus pipelines add on top.
#
# Offset contract (deliberate, documented dialect):
# - Offsets are Python ``str`` indices (code points) into the exact HTML
#   string fed in; ``start`` is the first source char of the block's first
#   text-contributing event, ``end`` is one past the last char of its last
#   event.  Entity references count at SOURCE length (``&amp;`` spans 5).
# - Text-contributing events are data runs, entity refs, and char refs
#   outside SKIP_TAGS subtrees; whitespace-only runs extend the span but a
#   block whose normalized text is empty is dropped (same rule as
#   ``classify_blocks`` — no row, no vote).
# - ``<br>`` renders as whitespace but has no source span of its own.
# - Entities decode via ``html.unescape`` of their reconstructed source
#   (terminator-aware), matching ``convert_charrefs=True`` semantics on
#   well-formed refs; legacy unterminated edge forms are defined BY this
#   kernel (the classifier twin and this parser agree on every corpus and
#   fixture input, asserted in tests).


@dataclass
class SpanBlock(Block):
    start: int = -1
    end: int = -1


class _SpanSegmenter(HTMLParser):
    """``_Segmenter`` with source-offset tracking (convert_charrefs=False
    so the feed position of every text event is observable)."""

    def __init__(self, html: str) -> None:
        super().__init__(convert_charrefs=False)
        self._html = html
        self._line_starts = [0]
        for m in re.finditer("\n", html):
            self._line_starts.append(m.end())
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._a_depth = 0
        self._skip_depth = 0
        self._span0 = -1
        self._span1 = -1
        self.blocks: list[tuple[str, int, int, int]] = []

    def _abs(self) -> int:
        ln, col = self.getpos()
        return self._line_starts[ln - 1] + col

    def _flush(self) -> None:
        text = _norm("".join(self._parts))
        link = _norm("".join(self._link_parts))
        self._parts.clear()
        self._link_parts.clear()
        s0, s1 = self._span0, self._span1
        self._span0 = self._span1 = -1
        if text:
            self.blocks.append((text, len(link), s0, s1))

    def _text_event(self, piece: str, start: int, end: int) -> None:
        if self._span0 < 0:
            self._span0 = start
        self._span1 = end
        self._parts.append(piece)
        self._link_parts.append(piece if self._a_depth else " ")

    # -- parser callbacks (tag logic identical to _Segmenter) -------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS and tag not in _VOID:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "br":
            self._parts.append(" ")
            self._link_parts.append(" ")
        if tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "br":
            self._parts.append(" ")
            self._link_parts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS and tag not in _VOID:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        start = self._abs()
        self._text_event(data, start, start + len(data))

    def handle_entityref(self, name: str) -> None:
        if self._skip_depth:
            return
        start = self._abs()
        end = start + 1 + len(name)
        terminated = end < len(self._html) and self._html[end] == ";"
        if terminated:
            end += 1
        src = "&" + name + (";" if terminated else "")
        self._text_event(_unescape(src), start, end)

    def handle_charref(self, name: str) -> None:
        if self._skip_depth:
            return
        start = self._abs()
        end = start + 2 + len(name)
        terminated = end < len(self._html) and self._html[end] == ";"
        if terminated:
            end += 1
        src = "&#" + name + (";" if terminated else "")
        self._text_event(_unescape(src), start, end)

    def close(self) -> None:
        super().close()
        self._flush()


def classify_block_spans(html: str, stopwords: frozenset = EN_STOPWORDS,
                         ) -> list[SpanBlock]:
    """``classify_blocks`` with source spans: segment, featurize, classify
    (context-free then context-sensitive), and carry each block's
    [start, end) offsets in the input string.  Never raises on tag soup."""
    seg = _SpanSegmenter(html)
    seg.feed(html)
    seg.close()

    blocks: list[SpanBlock] = []
    for text, link_chars, s0, s1 in seg.blocks:
        n_chars = len(text)
        toks = text.lower().split(" ")
        n_words = len(toks)
        stop_hits = sum(t in stopwords for t in toks)
        link_milli = (1000 * link_chars) // n_chars if n_chars else 0
        stop_milli = (1000 * stop_hits) // n_words if n_words else 0
        cf = _classify_cf(n_chars, link_chars, link_milli, stop_milli,
                          "©" in text)
        blocks.append(SpanBlock(text=text, n_chars=n_chars, n_words=n_words,
                                link_chars=link_chars, link_milli=link_milli,
                                stop_milli=stop_milli, cf_class=cf,
                                start=s0, end=s1))

    finals = _resolve_context([b.cf_class for b in blocks])
    for b, f in zip(blocks, finals):
        b.final_class = f
    return blocks
