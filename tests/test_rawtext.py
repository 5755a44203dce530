"""RAWTEXT (script/style) and drop-subtree gating across the HTML kernels.

Round-5 ADVICE regression pins: tag-shaped text inside <script>/<style>
must never mutate any kernel's parser state (HTML5 rawtext semantics in
the shared ``iter_tokens`` scanner), and tags inside the other dropped
subtrees (svg/iframe/noscript/template) are payload, not structure.
Also pins the inline-<code> sink routing (span stays in its enclosing
block) in the markdown renderer.
"""

from pdf_drawing_ocr_recognition_spark.kernel.codeblocks import (
    extract_code_blocks,
)
from pdf_drawing_ocr_recognition_spark.kernel.headings import (
    extract_headings,
    extract_sections,
)
from pdf_drawing_ocr_recognition_spark.kernel.html_extract import (
    block_features,
    iter_tokens,
)
from pdf_drawing_ocr_recognition_spark.kernel.images import extract_images
from pdf_drawing_ocr_recognition_spark.kernel.lists import extract_list_items
from pdf_drawing_ocr_recognition_spark.kernel.markdown import render_markdown


def _tags(html: str) -> list[tuple[str, str]]:
    return [(k, a) for k, a, _ in iter_tokens(html) if k != "d"]


class TestIterTokensRawtext:
    def test_script_body_is_one_data_run(self):
        html = '<script>document.write("<pre>");</pre><p></script><p>x</p>'
        assert _tags(html) == [
            ("t", "script"), ("e", "script"), ("t", "p"), ("e", "p"),
        ]

    def test_style_body_with_child_combinator(self):
        # CSS '>' and '<' must not re-enter the tokenizer
        html = "<style>p > a { content: '<li>' }</style><ul><li>k</li></ul>"
        assert _tags(html) == [
            ("t", "style"), ("e", "style"),
            ("t", "ul"), ("t", "li"), ("e", "li"), ("e", "ul"),
        ]

    def test_close_tag_case_and_space_variants(self):
        for close in ("</script>", "</SCRIPT>", "</script >", "</script foo=1>"):
            html = f"<script>var a = '<b>';{close}<p>x</p>"
            assert _tags(html) == [
                ("t", "script"), ("e", "script"), ("t", "p"), ("e", "p"),
            ], close

    def test_not_a_close_tag_prefix(self):
        # "</scripty>" is NOT an appropriate end tag — still rawtext
        html = "<script></scripty></script><p>x</p>"
        toks = list(iter_tokens(html))
        assert ("d", "</scripty>", None) in toks
        assert _tags(html) == [
            ("t", "script"), ("e", "script"), ("t", "p"), ("e", "p"),
        ]

    def test_unterminated_script_swallows_to_eof(self):
        html = "<script>var x;<p>never a tag"
        toks = list(iter_tokens(html))
        assert _tags(html) == [("t", "script")]
        assert toks[-1] == ("d", "var x;<p>never a tag", None)

    def test_linear_on_script_flood(self):
        # many rawtext regions stay linear and balanced
        html = "<script>a<b</script>" * 5000
        toks = _tags(html)
        assert len(toks) == 10000


class TestAdviceRepros:
    def test_markdown_script_cannot_open_fence(self):
        html = '<script>document.write("<pre>");</script><p>hello</p><p>world</p>'
        assert render_markdown(html) == "hello\n\nworld"

    def test_headings_not_opened_from_js_strings(self):
        html = "<script>var s = '<h1>fake';</script><h2>real</h2>"
        got = extract_headings(html)
        assert [(h["level"], h["text"]) for h in got] == [(2, "real")]

    def test_sections_ignore_script_markup(self):
        html = "<script>'<h1>fake'</script><h1>T</h1>body"
        got = extract_sections(html)
        assert [(s["title"], s["text"]) for s in got] == [("T", "body")]

    def test_images_not_harvested_from_script_text(self):
        html = "<script>var h = '<img src=\"http://e.com/x.png\">';</script>"
        assert extract_images(html, "http://a.com/") == []

    def test_lists_ignore_li_in_script(self):
        html = "<script>'<li>fake'</script><ul><li>real</li></ul>"
        got = extract_list_items(html)
        assert [r["text"] for r in got] == ["real"]

    def test_codeblocks_ignore_pre_in_script(self):
        html = "<script>'<pre>fake</pre>'</script><code>real</code>"
        got = extract_code_blocks(html)
        assert [(b["tag"], b["text"]) for b in got] == [("code", "real")]

    def test_block_features_anchor_not_opened_in_script(self):
        # an unpaired <a href> inside JS must not inflate link_density
        html = (
            "<script>document.write('<a href=\"/x\">');</script>"
            "<p>ten plain words of ordinary running body text here now "
            "plus more filler words to pass the density gate easily</p>"
        )
        blocks = block_features(html)
        assert len(blocks) == 1
        assert blocks[0]["link_density"] == 0.0


class TestDropSubtreeTagGating:
    def test_svg_text_tags_are_payload(self):
        html = "<svg><text>'<h1>'</text><ul><li>no</li></ul></svg><h2>yes</h2>"
        assert [h["text"] for h in extract_headings(html)] == ["yes"]
        assert extract_list_items(html) == []

    def test_noscript_img_not_harvested(self):
        html = '<noscript><img src="http://e.com/x.png"></noscript>'
        assert extract_images(html, "http://a.com/") == []

    def test_markdown_iframe_fallback_dropped(self):
        html = "<iframe><p>fallback</p><pre>x</pre></iframe><p>body</p>"
        assert render_markdown(html) == "body"


class TestInlineCodeSinkRouting:
    def test_code_stays_in_list_item(self):
        html = "<ul><li>item <code>foo</code> tail</li></ul>"
        assert render_markdown(html) == "- item `foo` tail"

    def test_code_stays_in_table_cell(self):
        html = "<table><tr><td>a <code>b</code> c</td></tr></table>"
        assert render_markdown(html) == "| a `b` c |"

    def test_code_stays_in_heading(self):
        html = "<h2>use <code>flag</code> here</h2>"
        assert render_markdown(html) == "## use `flag` here"

    def test_paragraph_inline_code_unchanged(self):
        html = "<p>see <code>x=1</code> end</p>"
        assert render_markdown(html) == "see `x=1` end"

    def test_unclosed_inline_code_in_item_at_eof(self):
        html = "<ul><li>item <code>foo"
        assert render_markdown(html) == "- item `foo`"
