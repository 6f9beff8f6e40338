"""HTML→Markdown kernel: hand-authored goldens + tag-soup robustness."""

import random

import pytest

from doctor_spark.kernels.markdown import html_to_markdown
from doctor_spark.kernels.markdown_goldens import GOLDENS


@pytest.mark.parametrize("name,html,want", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_goldens(name, html, want):
    assert html_to_markdown(html) == want


def test_tag_soup_never_raises():
    rng = random.Random(13)
    frags = [
        "<p>", "</p>", "<b>", "</i>", "<ul>", "<li>", "</table>",
        "<td>", "<tr>", "<a href='x>", "<pre>", "</pre>", "text ",
        "<h1>", "&amp;", "&#x41;", "<img>", "<blockquote>", "</ul>",
        "<script>", "</script>", "<!-- c -->", "<![CDATA[x]]>", "\x0b",
        "<table>", "<td ", ">", "<", "💡 ", "]]>", "&bogus;",
    ]
    for _ in range(200):
        soup = "".join(rng.choice(frags) for _ in range(rng.randrange(0, 40)))
        out = html_to_markdown(soup)
        assert isinstance(out, str)


def test_escaping_prevents_remark():
    out = html_to_markdown("<p>*not em* [not link](x) `not code`</p>")
    assert out == "\\*not em\\* \\[not link\\](x) \\`not code\\`"


def test_pre_preserves_verbatim_no_escape():
    out = html_to_markdown("<pre>a [b] *c* `d`\n  indented</pre>")
    assert out == "```\na [b] *c* `d`\n  indented\n```"
