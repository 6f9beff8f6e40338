"""OCR word-table → 2-D text assembly.

Reimplements (from scratch, same observable semantics) the reference's
tesseract-word-table post-processing:

- ``insert_whitespace`` — reference doctor/lib/text_extraction.py:237-259
- ``get_word``          — reference doctor/lib/text_extraction.py:262-320
- ``cleanup_ocr_text``  — reference doctor/tasks.py:254-268
- block grouping/assembly driver — reference
  doctor/lib/text_extraction.py:175-234 (``ocr_image_to_data`` /
  ``extract_with_ocr``)

The word table is the tesseract TSV shape the reference itself loads into a
pandas DataFrame (text, conf, left, top, width, height, line_num, par_num,
block_num) — identical shape here, produced by a pluggable OCR backend.

Byte-identical contract: reference unit tests doctor/tests.py:577-727 ported
verbatim in tests/test_kernels_ocr.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from .whitespace import cleanup_content

FULL_BLOCK = "□"  # □ — the reference's low-confidence placeholder

_OCR_LITERAL_FIXES = (
    ("Fi|ed", "Filed"),
    (" Il ", " II "),
)


def insert_whitespace(content: str, word: Mapping, prev: Mapping) -> str:
    """Append the vertical/horizontal whitespace that separates ``word`` from
    ``prev`` onto ``content``.

    New line or new paragraph → ``\\n`` (``\\n\\n`` when the vertical gap
    exceeds 100 px); horizontal pad = ``(left - prev_end) // 25`` spaces.
    Semantics match reference text_extraction.py:237-259.
    """
    new_line = prev.get("line_num", 0) != word["line_num"]
    new_par = prev.get("par_num", 0) != word["par_num"]
    prev_end = prev.get("left", 1) + prev.get("width", 1)

    if new_line or new_par:
        v_gap = word["top"] - (prev.get("top", 0) + prev.get("height", 0))
        content += "\n\n" if v_gap > 100 else "\n"
        prev_end = 0

    content += " " * int((word["left"] - prev_end) / 25)
    return content


def get_word(word_dict: Mapping, width: float, strip_margin: bool) -> str:
    """Confidence/margin-filter one OCR word; always returns ``word + " "``.

    Rules (reference text_extraction.py:262-320, thresholds at 288-292):

    - entirely left of the left margin and conf < 40      → spaces
    - conf == 0 and len <= 3, or left == 0                → spaces
    - conf < 5 and (len <= 3 or len > 20)                 → ``□`` * len
    - conf < 40 and starts right of the right margin      → ``□`` * len
    """
    ppi = width / 8.5
    if strip_margin:
        left_margin, right_margin = 1 * ppi, 7.5 * ppi
    else:
        left_margin, right_margin = 0.5 * ppi, 8.0 * ppi

    word = word_dict["text"]
    conf = word_dict["conf"]
    n = len(word)

    if word_dict["left"] + word_dict["width"] < left_margin and conf < 40:
        word = " " * n
    elif (conf == 0 and n <= 3) or word_dict["left"] == 0:
        word = " " * n
    elif conf < 5 and (n <= 3 or n > 20):
        word = FULL_BLOCK * n
    elif conf < 40 and word_dict["left"] > right_margin:
        word = FULL_BLOCK * n

    return f"{word} "


def cleanup_ocr_text(txt: str) -> str:
    """Safe literal OCR fixes (``Fi|ed``→``Filed``, `` Il ``→`` II ``).

    Semantics match reference tasks.py:254-268.
    """
    for bad, good in _OCR_LITERAL_FIXES:
        txt = txt.replace(bad, good)
    return txt


def group_words_into_blocks(words: Iterable[Mapping]) -> list[list[dict]]:
    """Group OCR words by ``block_num``; blocks ordered by the ``top`` of each
    block's first word; words keep table order within a block.

    Mirrors the reference's pandas
    ``df.groupby("block_num").first().sort_values("top")`` block ordering
    (text_extraction.py:196-213) without requiring pandas, so the kernel
    stays importable anywhere.  Words with ``conf == -1`` (tesseract layout
    rows, not words) are dropped, as in the reference.
    """
    order: list[int] = []
    blocks: dict[int, list[dict]] = {}
    for w in words:
        if w.get("conf", 0) == -1:
            continue
        b = w.get("block_num", 0)
        if b not in blocks:
            blocks[b] = []
            order.append(b)
        blocks[b].append(dict(w))
    order.sort(key=lambda b: blocks[b][0]["top"])
    return [blocks[b] for b in order]


def assemble_page_text(
    words: Iterable[Mapping],
    page_width: float,
    page_number: int,
    strip_margin: bool,
) -> str:
    """Full per-page OCR assembly: block-group → whitespace-reconstruct →
    confidence-filter → page cleanup.

    Mirrors reference ``extract_with_ocr`` (text_extraction.py:216-234): the
    running ``prev`` word carries across block boundaries.
    """
    content = ""
    prev: Mapping = {}
    for block in group_words_into_blocks(words):
        for word in block:
            content = insert_whitespace(content, word, prev)
            content += get_word(word, page_width, strip_margin)
            prev = word
    return cleanup_content(content, page_number)


def assemble_page_text_plain(words: Iterable[Mapping]) -> str:
    """Whole-document OCR analog of tesseract's plain stdout text (reference
    ``convert_file_to_txt``, tasks.py:271-284): words joined by single
    spaces, lines by ``\\n``, paragraphs by ``\\n\\n`` — no confidence
    filtering, no margin logic.
    """
    parts: list[str] = []
    prev_line = prev_par = prev_block = None
    for w in words:
        if w.get("conf", 0) == -1:
            continue
        key = (w.get("block_num", 0), w.get("par_num", 0))
        line = (key, w.get("line_num", 0))
        if prev_line is None:
            pass
        elif key != (prev_block, prev_par):
            parts.append("\n\n")
        elif line[1] != prev_line:
            parts.append("\n")
        else:
            parts.append(" ")
        parts.append(str(w["text"]))
        prev_block, prev_par = key
        prev_line = line[1]
    return "".join(parts)
