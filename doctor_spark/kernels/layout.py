"""DOM tag-path layout fingerprinting — the STRUCTURAL twin of
content fingerprinting: two pages render the same template when their
tag-path sets match, regardless of what text fills the slots.  Crawl
pipelines cluster by layout to find template families (one cleaning
rule per family), detect CMS reskins across hosts, and cheaply route
"same site, same template, different article" pages to the
template-line stripper.

From-scratch over stdlib ``html.parser`` (the repo's HTML discipline:
tag soup never raises).  A tag path is the stack of element names from
the root to an element ('html/body/div/p'); the fingerprint is the md5
of the newline-joined SORTED DISTINCT path set — insertion order and
slot multiplicity deliberately ignored, so adding one more <li> or one
more paragraph does not change the family, while changing the nesting
structure does.
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser

# WHATWG void elements: never pushed on the stack
_VOID = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)


class _PathCollector(HTMLParser):
    def __init__(self, max_depth: int) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.paths: set[str] = set()
        self.max_depth = max_depth

    def _record(self, tag: str) -> None:
        if len(self.stack) < self.max_depth:
            self.paths.add("/".join(self.stack + [tag]))

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        self._record(tag)
        if tag not in _VOID and len(self.stack) < self.max_depth:
            self.stack.append(tag)

    def handle_startendtag(self, tag, attrs):
        self._record(tag.lower())

    def handle_endtag(self, tag):
        tag = tag.lower()
        # tolerant pop: close the nearest matching open element
        if tag in self.stack:
            while self.stack and self.stack[-1] != tag:
                self.stack.pop()
            if self.stack:
                self.stack.pop()


def tag_paths(html: str, max_depth: int = 12) -> list[str]:
    """Sorted distinct root-to-element tag paths (depth-limited)."""
    p = _PathCollector(max_depth)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tag soup: keep whatever was collected
    return sorted(p.paths)


def layout_fingerprint(html: str, max_depth: int = 12) -> str:
    """md5 hex of the page's tag-path set — equal iff same layout
    family."""
    return hashlib.md5(
        "\n".join(tag_paths(html, max_depth)).encode()
    ).hexdigest()
