"""T179: HTML→Markdown rendering — goldens, soup, totality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_drawing_ocr_recognition_spark.kernel.markdown import render_markdown


def test_full_page_golden():
    html = (
        "<html><body><h1>Doc &amp; co</h1><p>intro text</p>"
        "<ul><li>alpha<li>beta</ul>"
        '<pre><code class="language-python">def f():\n    return 1</code></pre>'
        "<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table>"
        "<p>see <code>x=1</code> inline</p></body></html>"
    )
    assert render_markdown(html) == (
        "# Doc & co\n\nintro text\n\n- alpha\n- beta\n\n"
        "```python\ndef f():\n    return 1\n```\n\n"
        "| H1 | H2 |\n| --- | --- |\n| a | b |\n\nsee `x=1` inline"
    )


def test_soup_equals_well_formed():
    soup = "<h2>T<p>one<p>two<ul><li>a<li>b</ul>"
    closed = "<h2>T</h2><p>one</p><p>two</p><ul><li>a</li><li>b</li></ul>"
    assert render_markdown(soup) == render_markdown(closed)
    assert render_markdown(soup) == "## T\n\none\n\ntwo\n\n- a\n- b"


def test_nested_list_order_and_continuation():
    got = render_markdown(
        "<ul><li>x<ol><li>n1</li></ol>cont</li><li>y</li></ul>"
    )
    assert got == "- x\n  1. n1\n\ncont\n\n- y"


def test_fence_preserves_whitespace_and_drops_script():
    got = render_markdown("<pre>a  b\n\tc<script>evil</script>d</pre>")
    assert got == "```\na  b\n\tcd\n```"


def test_separator_only_after_first_header_row():
    got = render_markdown(
        "<table><tr><th>h</th></tr><tr><th>h2</th></tr><tr><td>d</td></tr></table>"
    )
    assert got == "| h |\n| --- |\n| h2 |\n| d |"


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_renderer_total(s):
    assert isinstance(render_markdown(s), str)
