"""Frozen goldens for the from-scratch HTML cleaner (kernel F3).

The semantics target the reference's lxml Cleaner(style=True,
remove_tags=[a, body, font, noscript, img]) behavior (doctor/tasks.py:361-370,
README.md:71).  lxml is absent in this sandbox, so these goldens define the
engine's exact output; known divergences from lxml serialization (entity
normalization, <div> root wrapping that lxml sometimes adds) are noted here.
"""

from doctor_spark.kernels.html import clean_html, extract_from_html_bytes, html_to_text
from doctor_spark.kernels.textfile import decode_html_ladder, decode_txt


class TestCleanHtml:
    def test_unwrap_listed_tags(self):
        src = '<body><p>go <a href="/x">here</a> and <font size="2">big</font></p></body>'
        assert clean_html(src) == "<p>go here and big</p>"

    def test_script_style_content_dropped(self):
        src = "<p>keep</p><script>var x = 1;</script><style>p{color:red}</style><p>tail</p>"
        assert clean_html(src) == "<p>keep</p><p>tail</p>"

    def test_head_dropped_body_unwrapped(self):
        src = (
            "<!DOCTYPE html><html><head><title>T</title>"
            '<meta charset="utf-8"><link rel="x"></head>'
            "<body><h1>Header</h1><p>text</p></body></html>"
        )
        assert clean_html(src) == "<h1>Header</h1><p>text</p>"

    def test_comments_dropped(self):
        assert clean_html("<p>a<!-- hidden -->b</p>") == "<p>ab</p>"

    def test_img_and_noscript_unwrapped(self):
        src = '<p><img src="x.png" alt="pic">cap<noscript>ns</noscript></p>'
        assert clean_html(src) == "<p>capns</p>"

    def test_style_and_on_attrs_dropped(self):
        src = '<p style="color:red" onclick="evil()" class="k">x</p>'
        assert clean_html(src) == '<p class="k">x</p>'

    def test_javascript_url_dropped(self):
        src = '<div href="javascript:alert(1)" id="d">x</div>'
        assert clean_html(src) == '<div id="d">x</div>'

    def test_form_subtree_killed(self):
        src = "<p>a</p><form><input name='q'><button>go</button></form><p>b</p>"
        assert clean_html(src) == "<p>a</p><p>b</p>"

    def test_tag_soup_unclosed(self):
        src = "<div><p>one<p>two"
        assert clean_html(src) == "<div><p>one<p>two</p></p></div>"

    def test_entities_normalized(self):
        # divergence note: like lxml, character references are decoded then
        # re-escaped minimally (&amp; &lt; &gt; in text)
        assert clean_html("<p>a &amp; b &#60; c</p>") == "<p>a &amp; b &lt; c</p>"

    def test_table_preserved(self):
        src = "<table><tr><td>1</td><td>2</td></tr></table>"
        assert clean_html(src) == src

    def test_iframe_killed(self):
        assert clean_html('<p>a</p><iframe src="x"><p>inner</p></iframe>') == "<p>a</p>"


class TestEncodingLadder:
    def test_utf8_first(self):
        text, enc = decode_html_ladder("café".encode())
        assert (text, enc) == ("café", "utf-8")

    def test_cp1252_bytes_fall_to_iso8859(self):
        # 0x97 (em dash in cp1252) is invalid utf-8 but decodes in iso8859-1
        raw = b"a \x97 b"
        text, enc = decode_html_ladder(raw)
        assert enc == "iso8859-1"
        assert text == "a \x97 b"

    def test_full_html_path(self):
        content, err, rc = extract_from_html_bytes(
            "<body><p>héllo</p></body>".encode()
        )
        assert (content, err, rc) == ("<p>héllo</p>", "", 0)


class TestTxtLadder:
    def test_cp1252_default(self):
        # 0x93/0x94: curly quotes in cp1252
        content, err, rc = decode_txt(b"\x93quoted\x94")
        assert (content, err, rc) == ("“quoted”", "", 0)

    def test_utf8_fallback_when_cp1252_fails(self):
        # 0x81 is undefined in cp1252 -> utf-8(ignore) path
        content, err, rc = decode_txt(b"ok\x81\xe2\x9c\x93")
        assert rc == 0
        assert "ok" in content


class TestHtmlToText:
    def test_blocks_become_newlines(self):
        cleaned = "<h1>Title</h1><p>one two</p><p>three</p>"
        # adjacent block close+open => blank line (paragraph separation)
        assert html_to_text(cleaned) == "Title\n\none two\n\nthree"

    def test_whitespace_collapsed(self):
        assert html_to_text("<p>a   b\t c</p>") == "a b c"
