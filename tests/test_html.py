"""HTML boilerplate-stripping tests (goldens by construction — we
template the boilerplate, per SURVEY.md §7.6)."""

from pdftotext_spark.core.dispatch import extract_payload, sniff_kind
from pdftotext_spark.html import extract_main_content

ARTICLE = (
    "The quick brown fox jumps over the lazy dog while the observers "
    "take careful notes about its trajectory and speed."
)
PARA2 = (
    "A second paragraph continues the discussion with enough words to "
    "be classified as main content by the density heuristics."
)


def page(main_blocks: list[str]) -> str:
    nav = "".join(f'<li><a href="/{i}">Link {i}</a></li>' for i in range(8))
    body = "".join(f"<p>{b}</p>" for b in main_blocks)
    return f"""<!DOCTYPE html>
<html><head><title>t</title><style>p {{color: red}}</style>
<script>var x = 1; function f() {{ return "<p>fake</p>"; }}</script></head>
<body>
<header><h1>Site Name</h1><nav><ul>{nav}</ul></nav></header>
<aside><p>Subscribe to our newsletter for daily updates and offers</p></aside>
<div id="content"><article>{body}</article></div>
<div class="linkfarm"><p><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></p></div>
<footer><p>Copyright 2026 · <a href="/tos">Terms</a> · <a href="/privacy">Privacy</a></p></footer>
</body></html>"""


def test_main_content_survives():
    out = extract_main_content(page([ARTICLE, PARA2]))
    assert ARTICLE in out
    assert PARA2 in out


def test_boilerplate_removed():
    out = extract_main_content(page([ARTICLE]))
    assert "Link 3" not in out  # nav
    assert "Copyright" not in out  # footer
    assert "var x" not in out  # script
    assert "color: red" not in out  # style
    assert "fake" not in out  # markup inside script strings


def test_link_farm_removed():
    out = extract_main_content(page([ARTICLE]))
    assert "one" not in out.split()


def test_nested_same_tag_chrome_dropped_whole():
    # VERDICT r02 item 4: nested same-tag drop subtrees — a non-greedy
    # regex stops at the INNER close and leaks the trailing chrome
    body = (
        "<nav class=top><ul><li>Home</li></ul>"
        "<nav class=sub><a href=x>Products menu</a></nav>"
        "<p>trailing navwrap boilerplate leak</p></nav>"
        f"<article><p>{ARTICLE}</p></article>"
        "<div><aside><aside>inner widget</aside>outer widget rail</aside></div>"
    )
    out = extract_main_content(f"<html><body>{body}</body></html>")
    assert ARTICLE in out
    assert "leak" not in out
    assert "widget" not in out
    assert "Products" not in out


def test_unterminated_drop_tag_chrome_still_suppressed():
    # truncated page with an unclosed <nav>: the remainder is KEPT
    # (unclosed structural tags must not zero the page — code-review
    # r3) and the leaked link chrome is then dropped by link-density
    # scoring
    html = (
        f"<html><body><article><p>{ARTICLE}</p></article>"
        "<nav><a href=a>menu one</a><a href=b>menu two</a>"
    )
    out = extract_main_content(html)
    assert ARTICLE in out
    assert "menu" not in out


def test_self_closing_drop_tag_does_not_swallow():
    # <iframe/> style self-closing chrome must not open a subtree
    html = (
        f"<html><body><iframe src=x /><article><p>{ARTICLE}</p>"
        "</article></body></html>"
    )
    assert ARTICLE in extract_main_content(html)


def test_script_rawtext_fake_open_does_not_nest():
    # document.write('<script>') inside a script body must not deepen
    # the drop counter (raw-text elements cannot nest per spec)
    html = (
        "<html><body><script>document.write('<script>');var x=1;</script>"
        f"<article><p>{ARTICLE}</p></article></body></html>"
    )
    out = extract_main_content(html)
    assert ARTICLE in out
    assert "var x" not in out


def test_entities_unescaped():
    html = "<html><body><p>" + ("A&amp;B " * 12) + "</p></body></html>"
    assert "A&B" in extract_main_content(html)


def test_deterministic():
    p = page([ARTICLE, PARA2])
    assert extract_main_content(p) == extract_main_content(p)


def test_bom_prefixed_html_string_routes_as_html():
    p = "\ufeff" + page([ARTICLE])
    assert sniff_kind(p) == "html"
    res = extract_payload(p)
    assert res.kind == "html" and ARTICLE in res.text


def test_dispatch_html_route():
    p = page([ARTICLE])
    assert sniff_kind(p) == "html"
    res = extract_payload(p)
    assert res.kind == "html"
    assert ARTICLE in res.text
    assert res.n_pages == 1


def test_extract_title():
    from pdftotext_spark.html.extract import extract_title

    assert extract_title("<html><head><title> My  Page </title></head></html>") == "My Page"
    assert extract_title("<body><h1>Big <em>Header</em></h1></body>") == "Big Header"
    assert extract_title("<p>no title</p>") == ""
    assert extract_title("<title>A &amp; B</title>") == "A & B"


def test_is_error_page():
    from pdftotext_spark.html.extract import is_error_page

    assert is_error_page("<html><title>404 Not Found</title><body></body></html>")
    assert is_error_page("<html><body><h1>Page not found</h1></body></html>")
    assert is_error_page(
        "<html><body><p>Sorry, an error occurred.</p></body></html>"
    )
    # long real content mentioning 404 is NOT an error page
    long_article = "<html><title>HTTP status codes</title><body><p>" + (
        "The 404 status code indicates a missing resource and this "
        "article discusses it at length with many words. " * 10
    ) + "</p></body></html>"
    assert not is_error_page(long_article)
    assert not is_error_page(page([ARTICLE]))


def test_structural_markup_variants():
    # lists and tables keep their text; blocks split at block tags
    html = (
        "<html><body><article>"
        "<ul><li>alpha item with several words inside it</li>"
        "<li>beta item also with several words inside it</li></ul>"
        "<table><tr><td>cell one has words</td><td>cell two has words</td></tr></table>"
        "<p>" + ARTICLE + "</p></article></body></html>"
    )
    out = extract_main_content(html)
    assert ARTICLE in out
    # structural text survives (as continuation or standalone blocks)
    assert "alpha item" in out or "beta item" in out or "cell one" in out


def test_comment_with_markup_inside():
    html = (
        "<html><body><!-- <p>ghost content</p> --><p>"
        + ARTICLE
        + "</p></body></html>"
    )
    out = extract_main_content(html)
    assert "ghost" not in out and ARTICLE in out


def test_heading_before_article_kept():
    html = (
        "<html><body><h2>Short Headline Here</h2><p>"
        + ARTICLE
        + "</p></body></html>"
    )
    out = extract_main_content(html)
    assert "Short Headline Here" in out and ARTICLE in out


def test_isolated_short_block_still_dropped():
    html = (
        "<html><body><p>tiny fragment here</p>"
        "<div>" + "x " * 3 + "</div></body></html>"
    )
    assert extract_main_content(html) == ""


def test_densitometric_linked_prev_context():
    # NumWordsRules decision-tree branches (prev_ld > 0.5556): after a
    # heavily-linked block, a <=40-word block is content only with a
    # >17-word successor; a >40-word block is content unconditionally
    from pdftotext_spark.html.extract import _classify_blocks

    linkbar = ("one two three four five six", 27)  # fully linked
    medium = ("word " * 20, 0)
    assert _classify_blocks([linkbar, medium, ("tail", 0)])[1] is False
    assert _classify_blocks([linkbar, medium, ("tok " * 25, 0)])[1] is True
    assert _classify_blocks([linkbar, ("word " * 45, 0), ("tail", 0)])[1] is True
    # the linked bar itself is always boilerplate
    assert _classify_blocks([linkbar, medium, ("tail", 0)])[0] is False


def test_largest_block_fallback_single_paragraph():
    # a lone 12-word paragraph survives via the KeepLargestBlock
    # fallback even though the context rules alone would drop it
    html = "<html><body><p>" + ("alpha " * 12) + "</p></body></html>"
    assert "alpha" in extract_main_content(html)


def test_nav_heavy_page_interleaved_links():
    # link bars around real paragraphs (not inside <nav>) are dropped
    # purely by density — no tag hints
    bar = '<div>' + " ".join(f'<a href="/{i}">item{i}</a>' for i in range(10)) + "</div>"
    html = f"<html><body>{bar}<p>{ARTICLE}</p><p>{PARA2}</p>{bar}</body></html>"
    out = extract_main_content(html)
    assert ARTICLE in out and PARA2 in out
    assert "item3" not in out


def test_charset_sniffing():
    from pdftotext_spark.html.extract import decode_html_bytes, sniff_charset

    assert sniff_charset("﻿hi".encode("utf-8")) == "utf-8-sig"
    assert sniff_charset("hällo".encode("utf-16")) == "utf-16"
    assert decode_html_bytes("hällo".encode("utf-16")) == "hällo"
    raw = b'<html><head><meta charset="windows-1252"></head><body>caf\x92s \x80100</body></html>'
    assert sniff_charset(raw) == "windows-1252"
    assert "caf’s €100" in decode_html_bytes(raw)
    xml = b'<?xml version="1.0" encoding="ISO-8859-1"?><html><body>caf\xe9</body></html>'
    assert decode_html_bytes(xml).count("café") == 1
    assert sniff_charset(b"plain ascii") == "utf-8"
    assert sniff_charset(b"bad \xff\xfa bytes") == "cp1252"
    # bogus declared charset falls through to the probe
    assert sniff_charset(b'<meta charset="no-such-enc">caf\xc3\xa9') == "utf-8"


def test_b64_gzip_payloads_routed_by_content():
    import base64
    import gzip

    from pdftotext_spark.core.dispatch import B64_SENTINEL

    def wrap(raw: bytes) -> str:
        return B64_SENTINEL + base64.b64encode(gzip.compress(raw)).decode()

    # gzip-wrapped HTML → html route
    page_txt = "<html><body><p>" + ARTICLE + "</p></body></html>"
    res = extract_payload(wrap(page_txt.encode("utf-8")))
    assert res.kind == "html" and ARTICLE in res.text and res.decode_failures == 0
    # gzip-wrapped PDF → pdf route
    from pdftotext_spark.sources import pdfbuilder as pb

    pdf = pb.simple_pdf([["gzip wrapped pdf body"]])
    res = extract_payload(wrap(pdf))
    assert res.kind == "pdf-b64" and res.text == "gzip wrapped pdf body"
    # gzip-wrapped plain text → plain, not a decode failure
    res = extract_payload(wrap("just some compressed text".encode("utf-8")))
    assert res.kind == "plain"
    assert res.text == "just some compressed text"
    assert res.decode_failures == 0
    # corrupt gzip stays a metric, never a raise
    import base64 as b64mod

    bad = B64_SENTINEL + b64mod.b64encode(b"\x1f\x8b\x08CORRUPT").decode()
    res = extract_payload(bad)
    assert res.decode_failures == 1 and "gzip" in res.failure_reasons[0]


def test_b64_html_payload_routed_by_content():
    import base64

    from pdftotext_spark.core.dispatch import B64_SENTINEL

    page_txt = "<html><body><p>" + ARTICLE + "</p></body></html>"
    raw = ("\ufeff" + page_txt).encode("utf-8")  # BOM-carrying bytes
    payload = B64_SENTINEL + base64.b64encode(raw).decode("ascii")
    res = extract_payload(payload)
    assert res.kind == "html"
    assert ARTICLE in res.text
    assert res.decode_failures == 0


def test_unquoted_attr_trailing_slash_not_self_closing():
    # code-review r3: '<script src=http://cdn/lib/>' is an OPEN tag —
    # the trailing '/' belongs to the unquoted attribute value, and
    # script never self-closes; its body must not leak into text
    html = (
        "<html><body><script src=http://cdn.example/lib/>"
        "var leaked = 'boilerplate';</script>"
        f"<article><p>{ARTICLE}</p></article></body></html>"
    )
    out = extract_main_content(html)
    assert ARTICLE in out
    assert "leaked" not in out


def test_unclosed_structural_drop_tag_keeps_content():
    # code-review r3: a sloppy page with an unclosed <nav> must not
    # lose the whole document — the remainder is kept and chrome is
    # handled by block scoring (unclosed script/style still swallow)
    html = f"<html><body><nav>menu<p>{ARTICLE}</p>"
    out = extract_main_content(html)
    assert ARTICLE in out
    html2 = f"<html><body><script>var x = 1;<p>{ARTICLE}</p>"
    assert ARTICLE not in extract_main_content(html2)
