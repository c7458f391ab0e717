"""HTML main-content extraction via DOM text/link-density heuristics.

This branch is **new work mandated by the graft spec** (BASELINE.json
``north_rule``): the reference library contains no HTML code
(SURVEY.md §2.10). The heuristics follow the published
boilerplate-removal literature (Boilerpipe's shallow-text-features —
Kohlschütter et al., WSDM 2010 — and Readability-style link density):

1. drop non-content subtrees outright (``script style noscript svg
   nav header footer aside form iframe template``);
2. segment the remaining markup into *blocks* at block-level tags;
3. score each block: word count, link density (chars inside ``<a>`` /
   total chars), stopword-ish density via average word length;
4. keep blocks classified as content; join with newlines.

Pure stdlib (regex tokenizer — the container has no lxml/bs4), fully
deterministic, versioned by ``HEURISTICS_VERSION``.
"""

from __future__ import annotations

import html as _html
import re

HEURISTICS_VERSION = 1

_DROP_SUBTREE_TAGS = (
    "script",
    "style",
    "noscript",
    "svg",
    "nav",
    "header",
    "footer",
    "aside",
    "form",
    "iframe",
    "template",
    "select",
    "button",
)

_BLOCK_TAGS = frozenset(
    "p div section article main h1 h2 h3 h4 h5 h6 li ul ol table tr td th "
    "blockquote pre figure figcaption br hr dl dt dd".split()
)

_DROP_RE = re.compile(
    r"<(" + "|".join(_DROP_SUBTREE_TAGS) + r")\b.*?</\1\s*>",
    re.S | re.I,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*)>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")

# minimum words for a block to be considered content on its own
_MIN_WORDS = 8
# blocks with more than this fraction of linked text are boilerplate
_MAX_LINK_DENSITY = 0.33


def _segment_blocks(markup: str) -> list[tuple[str, int]]:
    """Split cleaned markup into text blocks; returns
    ``[(block_text, linked_chars)]``."""
    blocks: list[tuple[str, int]] = []
    buf: list[str] = []
    linked_chars = 0
    in_anchor = 0
    pos = 0

    def flush() -> None:
        nonlocal buf, linked_chars
        text = _WS_RE.sub(" ", "".join(buf)).strip()
        if text:
            blocks.append((text, linked_chars))
        buf = []
        linked_chars = 0

    for m in _TAG_RE.finditer(markup):
        text = markup[pos : m.start()]
        if text:
            t = _html.unescape(text)
            buf.append(t)
            if in_anchor:
                linked_chars += len(t.strip())
        pos = m.end()
        closing, tag = m.group(1), m.group(2).lower()
        if tag == "a":
            in_anchor = max(0, in_anchor - 1) if closing else in_anchor + 1
        elif tag in _BLOCK_TAGS:
            flush()
    tail = markup[pos:]
    if tail:
        buf.append(_html.unescape(tail))
    flush()
    return blocks


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.S | re.I)
_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1\s*>", re.S | re.I)
_INNER_TAG_RE = re.compile(r"<[^>]+>")


def extract_title(markup: str) -> str:
    """Document title: ``<title>`` else first ``<h1>``, tags stripped,
    whitespace collapsed."""
    m = _TITLE_RE.search(markup) or _H1_RE.search(markup)
    if not m:
        return ""
    return _WS_RE.sub(" ", _html.unescape(_INNER_TAG_RE.sub(" ", m.group(1)))).strip()


_ERROR_MARKERS = (
    "404", "not found", "page not found", "403", "forbidden",
    "access denied", "error occurred", "500", "internal server error",
    "service unavailable", "page does not exist", "page doesn't exist",
)


def is_error_page(markup: str, main_text: str | None = None) -> bool:
    """Soft-404 / error-page heuristic (a standard crawl-corpus
    filter): an error marker in the title or h1, or a marker-bearing
    page whose main content is near-empty."""
    title = extract_title(markup).lower()
    if any(m in title for m in _ERROR_MARKERS):
        return True
    text = (main_text if main_text is not None else extract_main_content(markup)).lower()
    if len(text) < 200:
        # near-empty main content: check the whole visible text (the
        # boilerplate stripper drops short error blurbs as non-content)
        visible = _WS_RE.sub(
            " ", _html.unescape(_INNER_TAG_RE.sub(" ", _COMMENT_RE.sub(" ", markup)))
        ).lower()
        if len(visible) < 600 and any(m in visible for m in _ERROR_MARKERS):
            return True
    return False


def extract_main_content(markup: str) -> str:
    """Strip boilerplate and return the main text content.

    Two passes: (1) mark long, low-link-density blocks as content;
    (2) adopt short link-free blocks *adjacent* to content (headings
    before an article body, short closing paragraphs after it) — the
    Boilerpipe neighbour rule."""
    markup = _COMMENT_RE.sub(" ", markup)
    prev = None
    while prev != markup:  # nested drop-tags
        prev = markup
        markup = _DROP_RE.sub(" ", markup)
    blocks = _segment_blocks(markup)

    is_core = [
        len(text.split()) >= _MIN_WORDS and (linked / len(text)) <= _MAX_LINK_DENSITY
        for text, linked in blocks
    ]
    out: list[str] = []
    for i, (text, linked) in enumerate(blocks):
        keep = is_core[i]
        if not keep and linked == 0 and len(text.split()) >= 3:
            neighbour = (i > 0 and is_core[i - 1]) or (
                i + 1 < len(blocks) and is_core[i + 1]
            )
            keep = neighbour
        if keep:
            out.append(text)
    return "\n".join(out)
