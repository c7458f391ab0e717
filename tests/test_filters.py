"""Unit tests for stream filter decoders (SURVEY.md §2.3 D1–D6)."""

import zlib

import pytest

from pdftotext_spark.core import filters
from pdftotext_spark.sources.pdfbuilder import _a85_encode, _lzw_encode

PAYLOADS = [
    b"",
    b"hello world",
    b"a" * 10_000,
    bytes(range(256)) * 37,
    b"BT /F1 12 Tf (text) Tj ET\n" * 200,
]


@pytest.mark.parametrize("data", PAYLOADS)
def test_flate_roundtrip(data):
    assert filters.flate_decode(zlib.compress(data)) == data


def test_flate_raw_deflate():
    co = zlib.compressobj(wbits=-15)
    raw = co.compress(b"raw deflate body") + co.flush()
    assert filters.flate_decode(raw) == b"raw deflate body"


@pytest.mark.parametrize("data", PAYLOADS)
def test_lzw_roundtrip(data):
    assert filters.lzw_decode(_lzw_encode(data)) == data


def test_lzw_dict_growth_past_9_bits():
    # enough distinct digrams to push codes past 511 (10-bit growth)
    data = bytes((i * 7 + j) % 256 for i in range(200) for j in range(17))
    assert filters.lzw_decode(_lzw_encode(data)) == data


def test_ascii_hex():
    assert filters.ascii_hex_decode(b"48 65 6C6C 6F>") == b"Hello"
    # odd trailing nibble pads with 0 (PdfToText.php:2913–2965)
    assert filters.ascii_hex_decode(b"7>") == b"\x70"
    with pytest.raises(filters.DecodeError):
        filters.ascii_hex_decode(b"4G>")


@pytest.mark.parametrize("data", PAYLOADS)
def test_ascii85_roundtrip(data):
    assert filters.ascii85_decode(_a85_encode(data)) == data


def test_ascii85_z_shorthand():
    assert filters.ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"


def test_run_length():
    # literal run: length 2 → copy 3 bytes; repeat run: 257-254=3 copies
    assert filters.run_length_decode(b"\x02abc\xfeX\x80") == b"abcXXX"


def test_detect_filters_chain():
    assert filters.detect_filters(b"<< /Filter [/ASCII85Decode /FlateDecode] >>") == [
        filters.FILTER_ASCII85,
        filters.FILTER_FLATE,
    ]
    assert filters.detect_filters(b"<< /Filter /FlateDecode >>") == [filters.FILTER_FLATE]
    assert filters.detect_filters(b"<< /Length 3 >>") == [filters.FILTER_NONE]
    assert filters.detect_filters(b"<< /Filter /JBIG2Decode >>") == [
        filters.FILTER_UNSUPPORTED
    ]


def test_decode_stream_chained():
    body = b"chained filters payload"
    enc = _a85_encode(zlib.compress(body))
    out = filters.decode_stream(
        b"<< /Filter [/ASCII85Decode /FlateDecode] >>", enc
    )
    assert out == body


def test_decode_stream_a85_gzip_sniff():
    # lone A85 whose payload is zlib-wrapped → opportunistic inflate
    # (PdfToText.php:2793–2796)
    body = b"sniffed deflate"
    enc = _a85_encode(zlib.compress(body))
    assert filters.decode_stream(b"<< /Filter /ASCII85Decode >>", enc) == body


def test_unsupported_filter_raises():
    with pytest.raises(filters.DecodeError):
        filters.decode_stream(b"<< /Filter /CCITTFaxDecode >>", b"xx")
