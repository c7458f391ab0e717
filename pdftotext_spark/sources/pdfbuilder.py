"""Deterministic synthetic-PDF construction (FIXTURES.md §2).

Builds small, valid PDF byte strings whose extracted text is known *by
construction* — the golden-file strategy from SURVEY.md §5.2 (the
reference ships Acrobat-generated goldens; the sandbox has no PHP, so
our goldens are self-generated). Every builder is pure and seeded-
deterministic: same args → same bytes.
"""

from __future__ import annotations

import zlib


def _lzw_encode(data: bytes) -> bytes:
    """Minimal LZW encoder (9→12-bit, clear=256, EOD=257) compatible
    with :func:`pdftotext_spark.core.filters.lzw_decode`."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_len = 9
    out_bits: list[tuple[int, int]] = [(256, 9)]  # leading clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
        else:
            out_bits.append((table[w], code_len))
            table[wc] = next_code
            next_code += 1
            # EarlyChange=1, decoder-lag adjusted: the decoder widens
            # post-add at 2^len - 1 and trails this encoder by exactly
            # one entry, so the encoder widens at 2^len.
            if next_code == (1 << code_len) and code_len < 12:
                code_len += 1
            if next_code >= 4095:
                out_bits.append((256, code_len))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                code_len = 9
            w = bytes([b])
    if w:
        out_bits.append((table[w], code_len))
        # phantom add: the decoder registers an entry for this final
        # code too, so mirror its width-growth check before EOD
        next_code += 1
        if next_code == (1 << code_len) and code_len < 12:
            code_len += 1
    out_bits.append((257, code_len))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, width in out_bits:
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _a85_encode(data: bytes) -> bytes:
    import base64

    return base64.a85encode(data) + b"~>"


def escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PdfBuilder:
    """Assemble a minimal but spec-valid PDF from numbered objects."""

    def __init__(self) -> None:
        self.objects: list[tuple[int, bytes]] = []
        self._next_id = 1

    def alloc(self) -> int:
        oid = self._next_id
        self._next_id += 1
        return oid

    def add(self, oid: int, body: bytes) -> int:
        self.objects.append((oid, body))
        return oid

    def add_stream(self, oid: int, dict_extra: bytes, data: bytes, filter_name: str | None = None) -> int:
        if filter_name == "FlateDecode":
            enc = zlib.compress(data)
        elif filter_name == "LZWDecode":
            enc = _lzw_encode(data)
        elif filter_name == "ASCIIHexDecode":
            enc = data.hex().encode() + b">"
        elif filter_name == "ASCII85Decode":
            enc = _a85_encode(data)
        else:
            enc = data
        fpart = f"/Filter /{filter_name} ".encode() if filter_name else b""
        body = (
            b"<< " + fpart + f"/Length {len(enc)} ".encode() + dict_extra + b" >>\n"
            b"stream\n" + enc + b"\nendstream\n"
        )
        return self.add(oid, body)

    def build(self, version: str = "1.4") -> bytes:
        out = bytearray(f"%PDF-{version}\n".encode())
        offsets: dict[int, int] = {}
        for oid, body in self.objects:
            offsets[oid] = len(out)
            out += f"{oid} 0 obj\n".encode() + body + b"endobj\n"
        xref_pos = len(out)
        n = max(offsets) + 1 if offsets else 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for i in range(1, n):
            off = offsets.get(i, 0)
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R >>\n"
            b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
        )
        return bytes(out)


def simple_pdf(
    pages_text: list[list[str]],
    stream_filter: str | None = None,
    font_encoding: str | None = None,
    use_tj_array: bool = False,
    metadata: dict[str, str] | None = None,
) -> bytes:
    """One font, N pages; each page is a list of lines drawn with
    ``Td``-advanced ``Tj`` (or a kerned ``TJ`` array when
    ``use_tj_array``). Extracted golden text per page is
    ``"\\n".join(lines)`` (spaces from kerning offsets when TJ)."""
    b = PdfBuilder()
    catalog = b.alloc()
    pages_node = b.alloc()
    font = b.alloc()
    page_ids = [b.alloc() for _ in pages_text]
    content_ids = [b.alloc() for _ in pages_text]

    kids = " ".join(f"{p} 0 R" for p in page_ids)
    b.add(catalog, b"<< /Type /Catalog /Pages " + f"{pages_node} 0 R".encode() + b" >>\n")
    b.add(
        pages_node,
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>\n".encode(),
    )
    enc = f" /Encoding /{font_encoding}" if font_encoding else ""
    b.add(
        font,
        f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica{enc} >>\n".encode(),
    )
    for pid, cid, lines in zip(page_ids, content_ids, pages_text):
        b.add(
            pid,
            (
                f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> "
                f"/Contents {cid} 0 R >>\n"
            ).encode(),
        )
        ops = ["BT", "/F1 12 Tf", "1 0 0 1 72 720 Tm"]
        for i, line in enumerate(lines):
            if i > 0:
                ops.append("0 -14 Td")
            if use_tj_array:
                words = line.split(" ")
                arr = " -300 ".join(f"({escape_literal(w)})" for w in words)
                ops.append(f"[ {arr} ] TJ")
            else:
                ops.append(f"({escape_literal(line)}) Tj")
        ops.append("ET")
        content = "\n".join(ops).encode("latin-1")
        b.add_stream(cid, b"", content, stream_filter)
    if metadata:
        info = b.alloc()
        parts = "".join(
            f"/{k} ({escape_literal(v)}) " for k, v in metadata.items()
        )
        b.add(info, f"<< {parts}>>\n".encode())
    return b.build()


def tounicode_pdf(text: str, mode: str = "bfchar") -> tuple[bytes, str]:
    """A PDF whose font remaps bytes through a ToUnicode CMap.

    Byte code ``0x41 + i`` maps to ``text[i]``; content draws the code
    bytes, so decoding must reproduce ``text`` exactly.
    ``mode='bfrange'`` exercises the interval path: codes map through a
    single contiguous bfrange onto a base codepoint.
    Returns (pdf_bytes, golden_text).
    """
    b = PdfBuilder()
    catalog, pages_node, font, cmap, page, content = (b.alloc() for _ in range(6))
    if mode == "bfchar":
        entries = "".join(
            f"<{0x41 + i:02X}> <{ord(c):04X}>\n" for i, c in enumerate(text)
        )
        cmap_body = (
            "/CIDInit /ProcSet findresource begin begincmap\n"
            "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
            f"{len(text)} beginbfchar\n{entries}endbfchar\n"
            "endcmap end\n"
        )
        codes = bytes(0x41 + i for i in range(len(text)))
        golden = text
    else:  # bfrange: codes 0x20..0x7E map to themselves via one range
        cmap_body = (
            "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
            "1 beginbfrange\n<20> <7E> <0020>\nendbfrange\nendcmap\n"
        )
        codes = text.encode("ascii")
        golden = text
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            f"/ToUnicode {cmap} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(cmap, b"", cmap_body.encode("ascii"), "FlateDecode")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    hexcodes = codes.hex().upper()
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm <{hexcodes}> Tj ET".encode(),
    )
    return b.build(), golden


def identity_h_pdf(text: str) -> tuple[bytes, str]:
    """Identity-H CID font: 2-byte codes with a 2-byte ToUnicode CMap."""
    b = PdfBuilder()
    catalog, pages_node, font, cmap, page, content = (b.alloc() for _ in range(6))
    entries = "".join(
        f"<{0x0100 + i:04X}> <{ord(c):04X}>\n" for i, c in enumerate(text)
    )
    cmap_body = (
        "begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(text)} beginbfchar\n{entries}endbfchar\nendcmap\n"
    )
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /CustomCID "
            f"/Encoding /Identity-H /ToUnicode {cmap} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(cmap, b"", cmap_body.encode("ascii"), "FlateDecode")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    hexcodes = "".join(f"{0x0100 + i:04X}" for i in range(len(text)))
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm <{hexcodes}> Tj ET".encode(),
    )
    return b.build(), text


def identity_h_no_tounicode_pdf(text: str, base_font: str = "ABCDEE+Arial") -> tuple[bytes, str]:
    """Identity-H CID font with NO /ToUnicode: codes are raw glyph ids
    in the MS-core-font standard order (gid = codepoint − 29), the
    layout the CID-table fallback (core/cidmaps.py, F11) must recover.
    ``text`` must be printable ASCII."""
    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /{base_font} "
            f"/Encoding /Identity-H >>\n"
        ).encode(),
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    hexcodes = "".join(f"{ord(c) - 29:04X}" for c in text)
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm <{hexcodes}> Tj ET".encode(),
    )
    return b.build(), text


def identity_h_japan1_pdf(
    text: str, stream_filter: str | None = "FlateDecode"
) -> tuple[bytes, str]:
    """Identity-H CID font with NO /ToUnicode whose /DescendantFonts
    CIDFont declares ``/CIDSystemInfo /Ordering (Japan1)`` — the CJK
    subset-font shape that degrades to ``''`` without the Adobe-Japan1
    ordering table (core/cjk_cid.py).  Glyph ids in the content stream
    are real Adobe-Japan1 CIDs for ``text`` (kana/kanji/ASCII)."""
    from pdftotext_spark.core.cjk_cid import adobe_japan1_reverse

    rev = adobe_japan1_reverse()
    cids = [rev[c] for c in text]  # KeyError = not representable
    b = PdfBuilder()
    catalog, pages_node, font, desc, page, content = (b.alloc() for _ in range(6))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /QWERAS+HiraMinPro-W3 "
            f"/Encoding /Identity-H /DescendantFonts [{desc} 0 R] >>\n"
        ).encode(),
    )
    b.add(
        desc,
        (
            f"<< /Type /Font /Subtype /CIDFontType0 "
            f"/BaseFont /QWERAS+HiraMinPro-W3 "
            f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
            f"/Supplement 6 >> /DW 1000 >>\n"
        ).encode(),
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    hexcodes = "".join(f"{cid:04X}" for cid in cids)
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm <{hexcodes}> Tj ET".encode(),
        stream_filter,
    )
    return b.build(), text


def differences_pdf() -> tuple[bytes, str]:
    """/Encoding dict with /Differences mapping codes to named glyphs,
    ``uniXXXX`` forms and base-encoding fallthrough (F7/F8)."""
    b = PdfBuilder()
    catalog, pages_node, font, encdict, page, content = (b.alloc() for _ in range(6))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding {encdict} 0 R >>\n".encode(),
    )
    # 0x80→é (eacute), 0x81→€ (uni20AC), 0x82→fi ligature
    b.add(
        encdict,
        b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 128 /eacute /uni20AC /fi ] >>\n",
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    content_ops = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (caf\x80 \x81 \x82n) Tj ET"
    b.add_stream(content, b"", content_ops)
    return b.build(), "café € ﬁn"


def objstm_pdf(line: str) -> tuple[bytes, str]:
    """Catalog/pages/page/font live inside a /ObjStm compound object;
    only the content stream is a top-level object (S6)."""
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        ),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    header = []
    bodies = []
    off = 0
    for oid, body in inner_objs:
        header.append(f"{oid} {off}")
        bodies.append(body)
        off += len(body) + 1
    header_bytes = (" ".join(header) + "\n").encode()
    payload = header_bytes + b" ".join(bodies) + b" "
    first = len(header_bytes)

    b = PdfBuilder()
    b._next_id = 5
    content = b.alloc()
    objstm = b.alloc()
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm ({escape_literal(line)}) Tj ET".encode(),
    )
    b.add_stream(
        objstm,
        f"/Type /ObjStm /N {len(inner_objs)} /First {first}".encode(),
        payload,
        "FlateDecode",
    )
    return b.build(), line


def encrypted_pdf() -> bytes:
    """A PDF whose trailer declares /Encrypt → must be marked
    undecodable (D7 observable behavior)."""
    pdf = simple_pdf([["secret"]])
    return pdf.replace(
        b"trailer\n<< ", b"trailer\n<< /Encrypt 9 0 R ", 1
    )


def image_pdf(line: str = "with image", n_images: int = 1) -> tuple[bytes, bytes]:
    """A one-page PDF embedding JPEG image XObjects (DCTDecode
    passthrough, M4/PdfToText.php:8793–8805). Returns
    (pdf_bytes, the deterministic fake-JPEG bytes)."""
    # minimal JPEG-shaped bytes: SOI + APP0 "JFIF" + payload + EOI
    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + bytes((i * 7) % 256 for i in range(64))
        + b"\xff\xd9"
    )
    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    img_ids = [b.alloc() for _ in range(n_images)]
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    xobjs = " ".join(f"/Im{i} {oid} 0 R" for i, oid in enumerate(img_ids))
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> /XObject << {xobjs} >> >> "
            f"/Contents {content} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(
        content,
        b"",
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm ({escape_literal(line)}) Tj ET".encode(),
    )
    for oid in img_ids:
        b.add_stream(
            oid,
            b"/Subtype /Image /Width 8 /Height 8 /ColorSpace /DeviceRGB /BitsPerComponent 8",
            jpeg,
            "DCTDecode",
        )
    return b.build(), jpeg


def raster_pdf(width: int = 4, height: int = 3, colorspace: str = "DeviceRGB") -> tuple[bytes, bytes, bytes]:
    """One-page PDF with a Flate-compressed raw raster image XObject
    (M4). Returns (pdf_bytes, raster_bytes, image_dict_part)."""
    ncomp = {"DeviceRGB": 3, "DeviceGray": 1, "DeviceCMYK": 4}[colorspace]
    raster = bytes((x * 31 + 7) % 256 for x in range(width * height * ncomp))
    b = PdfBuilder()
    catalog, pages_node, page, content, img = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /XObject << /Im0 {img} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(content, b"", b"q 100 0 0 100 72 600 cm /Im0 Do Q")
    dict_extra = (
        f"/Subtype /Image /Width {width} /Height {height} "
        f"/ColorSpace /{colorspace} /BitsPerComponent 8"
    ).encode()
    b.add_stream(img, dict_extra, raster, "FlateDecode")
    return b.build(), raster, dict_extra


def multipage_pdf(n_pages: int = 3) -> tuple[bytes, list[str]]:
    pages = [[f"Page {i + 1} line one", f"Page {i + 1} line two"] for i in range(n_pages)]
    goldens = ["\n".join(p) for p in pages]
    return simple_pdf(pages), goldens
