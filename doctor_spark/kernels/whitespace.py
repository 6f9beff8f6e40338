"""Page/document whitespace algebra.

Reimplements (from scratch, same observable semantics) the reference's
page-cleanup text algebra:

- ``remove_excess_whitespace`` — reference
  doctor/lib/text_extraction.py:365-380
- ``adjust_caption_lines``     — reference
  doctor/lib/text_extraction.py:100-129
- ``cleanup_content``          — reference
  doctor/lib/text_extraction.py:323-362

Byte-identical contract: the reference's own unit tests
(doctor/tests.py:730-834) are ported verbatim in
tests/test_kernels_whitespace.py.
"""

from __future__ import annotations

import re

_LEADING_SPACES = re.compile(r"^ +", re.MULTILINE)
_SPACE_ONLY_LINE = re.compile(r"^ +$", re.MULTILINE)
_FLOATING_PIPE = re.compile(r"\s{4,}\| $", re.MULTILINE)
_RIGHT_ARTIFACT = re.compile(r"\s{10,}[a-zA-Z0-9|] $", re.MULTILINE)


def remove_excess_whitespace(document: str) -> str:
    """Shift the page left by the minimum leading-space run, blank out
    space-only lines, strip leading/trailing newlines.

    Semantics match reference text_extraction.py:365-380: the shift amount is
    ``len(min(runs))`` where ``min`` is the lexicographic (== shortest, since
    all runs are all-spaces) minimum of the leading-space runs.
    """
    runs = _LEADING_SPACES.findall(document)
    if runs:
        shift = len(min(runs))
        document = re.sub(rf"^ {{{shift}}}", "", document, flags=re.MULTILINE)
    document = _SPACE_ONLY_LINE.sub("", document)
    return document.strip("\n")


def adjust_caption_lines(page_text: str) -> str:
    """Align caption separators (``)``, ``§``, ``:``) to a common column.

    For the first separator that has >= 3 lines whose last separator
    occurrence sits at column 30-70, right-pad every ``" <sep>"`` occurrence
    so the separators line up at the max such column.  Semantics match
    reference text_extraction.py:100-129 (including its quirks: ``row.find``
    of the *first* ``" <sep>"`` per row, and ``str.replace`` of every
    occurrence in that row).
    """
    for sep in (")", "§", ":"):
        line_pat = re.compile(rf".* +{re.escape(sep)} .*\n")
        hits = line_pat.findall(page_text)
        cols = [h.rindex(sep) for h in hits if 30 <= h.rindex(sep) <= 70]
        if len(cols) < 3:
            continue
        longest = max(cols)
        out = []
        for row in page_text.splitlines():
            idx = row.find(f" {sep}")
            pad = (longest - idx) * " "
            out.append(row.replace(f" {sep}", f"{pad}{sep}"))
        return "\n".join(out)
    return page_text


def cleanup_content(content: str, page_number: int) -> str:
    """Reduce legal-document line clutter for one page.

    1. drop "floating pipes" (``\\s{4,}| `` at end of line),
    2. drop single-char right-edge artifacts (``\\s{10,}X `` at end of line),
    3. left-shift via :func:`remove_excess_whitespace`,
    4. on page 1 only, align caption separators,
    5. append a trailing newline.

    Semantics match reference text_extraction.py:323-362.
    """
    content = _FLOATING_PIPE.sub("", content)
    content = _RIGHT_ARTIFACT.sub("", content)
    # module-level lookups kept late-bound so tests can patch them, mirroring
    # the reference test harness (doctor/tests.py:760-773)
    content = remove_excess_whitespace(content)
    if page_number == 1:
        content = adjust_caption_lines(content)
    return f"{content}\n"
