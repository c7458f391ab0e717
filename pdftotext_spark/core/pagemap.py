"""Page catalog mapping (SURVEY.md §2.5 G1–G6).

Builds ``page_no → [content object ids]`` plus per-page MediaBox and
page-local font/XObject alias maps by walking /Type/Catalog →
/Pages /Kids → /Type/Page /Contents, with the reference's fallbacks:
no catalog → every text object lands on page 1
(PdfToText.php:8159–8604, fallback 8356–8375; MediaBox defaults
595×850 at 8213–8220).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pdftotext_spark.core.fonts import FONT_ALIAS_RE
from pdftotext_spark.core.objects import PdfObject, dict_value, object_references

_TYPE_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s*\]"
)
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_RESOURCES_INLINE_RE = re.compile(rb"/Resources\s*<<")
_FONT_DICT_RE = re.compile(rb"/Font\s*(?:<<(.*?)>>|(\d+)\s+\d+\s+R)", re.S)
_XOBJ_DICT_RE = re.compile(rb"/XObject\s*(?:<<(.*?)>>|(\d+)\s+\d+\s+R)", re.S)
_SUBTYPE_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")
_SUBTYPE_FORM_RE = re.compile(rb"/Subtype\s*/Form\b")
_PAGINATION_RE = re.compile(
    rb"/Type\s*/Pagination\b.*?/Subtype\s*/(Header|Footer)", re.S
)
_ATTACHED_RE = re.compile(rb"/Attached\s*\[[^\]]*/(Top|Bottom)[^\]]*\]")

DEFAULT_PAGE_WIDTH = 595.0
DEFAULT_PAGE_HEIGHT = 850.0


def is_image(body: bytes) -> bool:
    """``IsImage`` (PdfToText.php:582–588). C-level substring gate:
    these classifiers run for every object of every document."""
    return b"/Image" in body and bool(_SUBTYPE_IMAGE_RE.search(body))


def is_form_xobject(body: bytes) -> bool:
    return b"/Form" in body and bool(_SUBTYPE_FORM_RE.search(body))


def is_page_header_or_footer(body: bytes) -> bool:
    """``IsPageHeaderOrFooter`` (PdfToText.php:623–631)."""
    if b"Pagination" in body and _PAGINATION_RE.search(body):
        return True
    return b"/Attached" in body and bool(_ATTACHED_RE.search(body))


def _balanced_dict(body: bytes, start: int) -> bytes:
    """Return the ``<<...>>`` span starting at ``start`` with nesting."""
    depth = 0
    i = start
    n = len(body)
    while i < n - 1:
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


@dataclass
class PageInfo:
    number: int
    content_ids: list[int] = field(default_factory=list)
    width: float = DEFAULT_PAGE_WIDTH
    height: float = DEFAULT_PAGE_HEIGHT
    font_aliases: dict[str, int] = field(default_factory=dict)
    xobject_aliases: dict[str, int] = field(default_factory=dict)


@dataclass
class _Peeked:
    kind: str  # catalog|pages|page|other
    refs: list[int] = field(default_factory=list)
    contents: list[int] = field(default_factory=list)
    media: tuple[float, float] | None = None
    resources: bytes | None = None
    resources_ref: int | None = None


class PageMap:
    """Per-document page catalog (PdfToText.php:7978–8604)."""

    def __init__(self) -> None:
        self._peeked: dict[int, _Peeked] = {}
        self.pages: dict[int, PageInfo] = {}
        self.xobjects: dict[int, int] = {}  # alias-resolved ids seen

    def peek(self, obj: PdfObject) -> None:
        """Classify one object (G1, PdfToText.php:8159–8267)."""
        body = obj.dict_part
        # C-level pre-gate: catalog/pages/page objects all carry one of
        # these substrings; most objects carry none, and this runs for
        # every object in every document
        if b"Catalog" not in body and b"Page" not in body:
            return
        # per-branch substring gates: a plain /Type /Page object (the
        # common case past the outer gate) should pay ONE regex, not
        # three — "Catalog"/"Pages" memmem-fail first
        if b"Catalog" in body and _TYPE_CATALOG_RE.search(body):
            pages_ref = dict_value(body, b"Pages")
            refs = object_references(pages_ref) if pages_ref else []
            self._peeked[obj.obj_id] = _Peeked("catalog", refs=refs)
            return
        if b"Pages" in body and _TYPE_PAGES_RE.search(body):
            kids = dict_value(body, b"Kids")
            refs = object_references(kids) if kids else []
            self._peeked[obj.obj_id] = _Peeked("pages", refs=refs)
            return
        if _TYPE_PAGE_RE.search(body):
            pk = _Peeked("page")
            contents = dict_value(body, b"Contents")
            if contents:
                pk.contents = object_references(contents)
            mm = _MEDIABOX_RE.search(body)
            if mm:
                x0, y0, x1, y1 = (float(mm.group(i)) for i in range(1, 5))
                pk.media = (abs(x1 - x0), abs(y1 - y0))
            rm = _RESOURCES_REF_RE.search(body)
            if rm:
                pk.resources_ref = int(rm.group(1))
            else:
                im = _RESOURCES_INLINE_RE.search(body)
                if im:
                    pk.resources = _balanced_dict(body, im.end() - 2)
            self._peeked[obj.obj_id] = pk
            return

    def _parse_resources(self, res: bytes, objects: dict[int, PdfObject], page: PageInfo) -> None:
        """Extract /Font and /XObject alias→id maps (G2,
        PdfToText.php:8083–8130), following one level of indirection."""
        for regex, target in ((_FONT_DICT_RE, page.font_aliases), (_XOBJ_DICT_RE, page.xobject_aliases)):
            m = regex.search(res)
            if not m:
                continue
            inner = m.group(1)
            if inner is None:
                ref = int(m.group(2))
                o = objects.get(ref)
                inner = o.dict_part if o else b""
            for am in FONT_ALIAS_RE.finditer(inner):
                target[am.group(1).decode("latin-1")] = int(am.group(2))

    def map_objects(self, objects: dict[int, PdfObject], text_object_ids: list[int]) -> None:
        """Assign page numbers by recursive kid traversal (G3,
        PdfToText.php:8351–8485); fallback: all text objects → page 1
        (PdfToText.php:8356–8375)."""
        catalog = next((p for p in self._peeked.values() if p.kind == "catalog"), None)
        page_no = 0
        visited: set[int] = set()

        def walk(oid: int) -> None:
            nonlocal page_no
            if oid in visited:
                return
            visited.add(oid)
            pk = self._peeked.get(oid)
            if pk is None:
                return
            if pk.kind in ("catalog", "pages"):
                for r in pk.refs:
                    walk(r)
            elif pk.kind == "page":
                page_no += 1
                pi = PageInfo(page_no, content_ids=list(pk.contents))
                if pk.media:
                    pi.width, pi.height = pk.media
                res = pk.resources
                if res is None and pk.resources_ref is not None:
                    o = objects.get(pk.resources_ref)
                    res = o.dict_part if o else None
                if res:
                    self._parse_resources(res, objects, pi)
                self.pages[page_no] = pi

        if catalog is not None:
            for r in catalog.refs:
                walk(r)
        if not self.pages:
            # orphan pages (catalog missing or refs broken)
            for oid, pk in sorted(self._peeked.items()):
                if pk.kind == "page" and oid not in visited:
                    walk_page = pk
                    page_no += 1
                    pi = PageInfo(page_no, content_ids=list(walk_page.contents))
                    if walk_page.media:
                        pi.width, pi.height = walk_page.media
                    res = walk_page.resources
                    if res is None and walk_page.resources_ref is not None:
                        o = objects.get(walk_page.resources_ref)
                        res = o.dict_part if o else None
                    if res:
                        self._parse_resources(res, objects, pi)
                    self.pages[page_no] = pi
        if not self.pages and text_object_ids:
            self.pages[1] = PageInfo(1, content_ids=sorted(text_object_ids))
