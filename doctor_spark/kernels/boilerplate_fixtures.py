"""Authoring-template fixtures for the boilerplate classifier.

``PAGES`` maps url -> HTML; ``BLOCKS`` is the hand-authored catalog of the
block-level text runs each page contains, in document order, with the
link-char count known by construction.  The catalog is the golden: the
kernel must recover exactly these (text, link_chars) pairs from the HTML,
and the DuckDB oracle recomputes every feature and both classification
stages from the catalog literals alone — so the Spark/HTML path and the
SQL path meet only at the final hash compare.

Branch coverage (context-free): link-dense bad, copyright bad, short,
short-with-links bad, high-band good (>320 milli, >200 chars), high-band
neargood (>320, <=200 chars), low-band neargood ((300, 320]), low-stopword
bad.  (Context): short between goods, short between bads, short
good/bad-mixed with and without the neargood rescue, neargood beside good,
neargood between bads, and the bad-by-default document edges.
"""

NAV = "Home About Contact News Archive"
GOOD = ("the court held that the motion was filed by the party and that "
        "the record of the case was complete for review on appeal because "
        "counsel for the state had argued that the question of law was "
        "not settled in this district court")
SHORT1 = "Read more in the full opinion below."
NEAR1 = ("counsel argued on appeal that the statute of limitations had "
         "not run in this case and remand was proper")
FOOT = "© 2024 Example Corp. All rights reserved."
SHORT2 = "Contact us for details."
SHORT3 = "He concurred."
GOOD2 = ("the panel found that the agency had failed to consider the "
         "record as a whole and that the rule was therefore arbitrary "
         "because it was adopted without notice to the parties and with "
         "no statement of basis or purpose in the docket")
SHORT4 = "End of document."
NEAR2 = ("the appellant seeks review of that order and the fees awarded "
         "under it in this court")
MIXED = "For the full docket entry see this page on the portal today."
MIXED_LINK = "this page"
LOWSTOP = ("Johnson Smith Garcia Miller Davis Rodriguez Martinez "
           "Hernandez Lopez Gonzalez Wilson Anderson Thomas Taylor Moore")
NEARLOW = ("the clerk entered judgment and copies of mandates went to "
           "counsel promptly following argument in december")


def _nav_html(text: str) -> str:
    return "<nav>" + " ".join(
        f'<a href="/{i}">{w}</a>' for i, w in enumerate(text.split(" "))
    ) + "</nav>"


# url -> (html, [(block_text, link_chars), ...] in document order)
_SPEC = {
    "https://ex.test/news": (
        "<html><body>" + _nav_html(NAV)
        + f"<p>{GOOD}</p><p>{SHORT1}</p><p>{NEAR1}</p>"
        + f"<footer>{FOOT}</footer></body></html>",
        [(NAV, len(NAV)), (GOOD, 0), (SHORT1, 0), (NEAR1, 0), (FOOT, 0)],
    ),
    "https://ex.test/portal": (
        "<body>" + _nav_html(NAV) + f"<p>{SHORT2}</p>"
        + f"<footer>{FOOT}</footer></body>",
        [(NAV, len(NAV)), (SHORT2, 0), (FOOT, 0)],
    ),
    "https://ex.test/article": (
        f"<article><p>{GOOD}</p><p>{SHORT3}</p><p>{GOOD2}</p>"
        f"<p>{SHORT4}</p></article>",
        [(GOOD, 0), (SHORT3, 0), (GOOD2, 0), (SHORT4, 0)],
    ),
    "https://ex.test/links": (
        f"<div><p>{NEAR2}</p>"
        '<p>For the full docket entry see <a href="/m">this page</a>'
        " on the portal today.</p></div>",
        [(NEAR2, 0), (MIXED, len(MIXED_LINK))],
    ),
    "https://ex.test/low": (
        f"<section><p>{LOWSTOP}</p><p>{GOOD2}</p><p>{NEARLOW}</p></section>",
        [(LOWSTOP, 0), (GOOD2, 0), (NEARLOW, 0)],
    ),
}

PAGES: dict[str, str] = {url: html for url, (html, _) in _SPEC.items()}
BLOCKS: list[tuple[str, int, str, int]] = [
    (url, i, text, link)
    for url, (_, blocks) in _SPEC.items()
    for i, (text, link) in enumerate(blocks)
]
