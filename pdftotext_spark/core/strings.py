"""PDF literal/hex string unescaping and name decoding.

Reference parity (SURVEY.md §2.6 T10/T12/T13):

- C-style + octal escape processing  (PdfToText.php:790–900, 924–976)
- line-continuation ``\\<newline>`` removal (PdfToText.php:3656)
- ``#xy`` hex escapes inside names    (PdfToText.php:1003–1022)
- UTF-16 BOM sniff for metadata strings (PdfToText.php:5347–5358)
"""

from __future__ import annotations

import re

# byte sets for C-level translate(None, ...) deletion (hot paths)
_WS_DELETE = b" \t\n\r\x0b\x0c"
_NON_HEX_DELETE = bytes(set(range(256)) - set(b"0123456789abcdefABCDEF"))

_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
    ord("["): b"[",
    ord("]"): b"]",
}


def unescape_literal(raw: bytes) -> bytes:
    """Process escapes inside a ``( ... )`` literal string body.

    Semantics match PdfToText.php:790–900: named escapes, 1–3 digit
    octal escapes, backslash-newline line continuation removed, and an
    unknown escape drops the backslash keeping the character.
    """
    if b"\\" not in raw:  # overwhelmingly common: no escapes at all
        return raw
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in _ESCAPES:
            out.extend(_ESCAPES[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            val = 0
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                val = val * 8 + (raw[j] - 0x30)
                j += 1
            out.append(val & 0xFF)
            i = j
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: keep the char
            out.append(c)
            i += 1
    return bytes(out)


def hex_string_bytes(raw: bytes) -> bytes:
    """Decode the body of a ``<...>`` hex string.

    Inner whitespace is stripped (PdfToText.php:4150); an odd trailing
    nibble is zero-padded per spec.
    """
    # C-level whitespace deletion (this runs per hex string token —
    # a regex sub here costs ~3x)
    h = raw.translate(None, _WS_DELETE)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        h = h.translate(None, _NON_HEX_DELETE)
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))


def decode_name(raw: bytes) -> str:
    """Decode ``#xy`` hex escapes inside a PDF name
    (PdfToText.php:1003–1022, e.g. ``/C2#5F0`` → ``C2_0``)."""
    def repl(m: re.Match[bytes]) -> bytes:
        return bytes([int(m.group(1), 16)])

    return re.sub(rb"#([0-9A-Fa-f]{2})", repl, raw).decode("latin-1")


def text_string_to_unicode(raw: bytes) -> str:
    """Decode a PDF *text string* (metadata values): UTF-16 if BOM'd,
    else PDFDocEncoding approximated as latin-1
    (PdfToText.php:5347–5358)."""
    if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
        try:
            return raw.decode("utf-16")
        except UnicodeDecodeError:
            return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")
