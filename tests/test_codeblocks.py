"""T164: code-block extraction — idioms, verbatim text, hostile totality."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.kernel.codeblocks import (
    extract_code_blocks,
)


def test_pre_code_idiom_is_one_block_with_lang():
    html = (
        "<p>intro</p><pre><code class=\"language-python\">def f(x):\n"
        "    return x</code></pre><p>outro</p>"
    )
    got = extract_code_blocks(html)
    assert len(got) == 1
    b = got[0]
    assert b["tag"] == "pre" and b["lang_hint"] == "python"
    assert b["text"] == "def f(x):\n    return x"  # indentation verbatim


def test_inline_code_and_ordering():
    got = extract_code_blocks(
        "<code>x=1</code> then <pre>y = 2\nz = 3</pre>"
    )
    assert [(b["idx"], b["tag"], b["text"]) for b in got] == [
        (0, "code", "x=1"),
        (1, "pre", "y = 2\nz = 3"),
    ]


def test_entities_unescape_but_whitespace_survives():
    got = extract_code_blocks("<pre>a &amp; b\n\t&lt;tag&gt;</pre>")
    assert got[0]["text"] == "a & b\n\t<tag>"


def test_script_inside_block_is_dropped():
    got = extract_code_blocks(
        "<pre>before<script>var x = 'evil';</script>after</pre>"
    )
    assert got[0]["text"] == "beforeafter"


def test_unterminated_block_flushes_at_eof():
    got = extract_code_blocks("<p>t</p><pre>tail d7")
    assert len(got) == 1 and got[0]["text"] == "tail d7"


def test_hostile_inputs_never_throw():
    cases = [
        "",
        "</code></pre></code>",  # stray closers
        "<code/>",  # self-closing: one empty block
        "<pre><pre><code>deep</code></pre></pre>x",  # nested same-family
        "<pre" + " " * 10000,  # unterminated tag
        "<pre>" + "a\n" * 50000,  # big unterminated block
        "<code class='language-'>e</code>",  # empty hint suffix
    ]
    for html in cases:
        blocks = extract_code_blocks(html)  # must not raise
        assert isinstance(blocks, list)
    assert extract_code_blocks("<code/>")[0]["text"] == ""
    nested = extract_code_blocks("<pre><pre><code>deep</code></pre></pre>x")
    assert len(nested) == 1 and nested[0]["text"] == "deep"


def test_lang_hint_first_wins_and_nested_code_class_found():
    got = extract_code_blocks(
        '<pre><code class="language-rust">fn main() {}</code></pre>'
        '<code class="other language-go">g</code>'
    )
    assert got[0]["lang_hint"] == "rust"
    assert got[1]["lang_hint"] == "go"
