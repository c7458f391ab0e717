"""Property-based robustness: the extraction surface must never raise
on arbitrary input (S5 contract — failures are metrics), and the
filter codecs must round-trip arbitrary payloads."""

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pdftotext_spark.core import filters
from pdftotext_spark.core.dispatch import extract_payload, sniff_kind
from pdftotext_spark.core.strings import hex_string_bytes, unescape_literal
from pdftotext_spark.html import extract_main_content
from pdftotext_spark.sources.pdfbuilder import _a85_encode, _lzw_encode

BYTES = st.binary(max_size=4096)
TEXT = st.text(max_size=2048)


@settings(derandomize=True, max_examples=150, deadline=None)
@given(TEXT)
def test_extract_payload_never_raises(payload):
    res = extract_payload(payload)
    assert isinstance(res.text, str)
    assert res.decode_failures >= 0
    assert sniff_kind(payload) in ("pdf", "pdf-b64", "html", "plain")


@settings(derandomize=True, max_examples=100, deadline=None)
@given(TEXT)
def test_pdf_prefixed_garbage_never_raises(payload):
    res = extract_payload("%PDF-1.4\n" + payload)
    assert isinstance(res.text, str)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_b64_wrapped_bytes_never_raise(data):
    # arbitrary binary behind the sentinel exercises the gzip sniff,
    # charset probe and content routing added in round 2
    import base64

    res = extract_payload("%B64%" + base64.b64encode(data).decode())
    assert isinstance(res.text, str)
    assert res.kind in ("pdf", "pdf-b64", "html", "plain")


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_b64_gzip_wrapped_bytes_never_raise(data):
    import base64
    import gzip

    res = extract_payload("%B64%" + base64.b64encode(gzip.compress(data)).decode())
    assert isinstance(res.text, str)
    assert res.decode_failures >= 0


@settings(derandomize=True, max_examples=150, deadline=None)
@given(BYTES)
def test_charset_sniff_never_raises(raw):
    from pdftotext_spark.html import decode_html_bytes, sniff_charset

    enc = sniff_charset(raw)
    assert isinstance(enc, str)
    assert isinstance(decode_html_bytes(raw), str)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=0x2FFFF), st.text(max_size=40))
def test_cid_lookup_never_raises(code, variant):
    from pdftotext_spark.core.cidmaps import lookup_cid_map, variant_candidates

    m = lookup_cid_map(variant or None)
    assert isinstance(m.lookup(code), str)
    assert isinstance(variant_candidates(variant), list)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_lzw_roundtrip_property(data):
    assert filters.lzw_decode(_lzw_encode(data)) == data


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_a85_roundtrip_property(data):
    assert filters.ascii85_decode(_a85_encode(data)) == data


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_flate_roundtrip_property(data):
    assert filters.flate_decode(zlib.compress(data)) == data


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_ascii_hex_roundtrip_property(data):
    enc = data.hex().encode() + b">"
    assert filters.ascii_hex_decode(enc) == data


@settings(derandomize=True, max_examples=100, deadline=None)
@given(BYTES)
def test_run_length_decode_never_hangs(data):
    # decoding arbitrary bytes either succeeds or raises DecodeError
    try:
        filters.run_length_decode(data)
    except filters.DecodeError:
        pass


@settings(derandomize=True, max_examples=150, deadline=None)
@given(BYTES)
def test_unescape_literal_total(raw):
    out = unescape_literal(raw)
    assert isinstance(out, bytes)


@settings(derandomize=True, max_examples=150, deadline=None)
@given(BYTES)
def test_hex_string_total(raw):
    assert isinstance(hex_string_bytes(raw), bytes)


@settings(derandomize=True, max_examples=75, deadline=None)
@given(TEXT)
def test_html_extraction_total(markup):
    out = extract_main_content("<html><body>" + markup + "</body></html>")
    assert isinstance(out, str)


@settings(derandomize=True, max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_decode_stream_on_random_flate_bytes(data):
    try:
        filters.decode_stream(b"<< /Filter /FlateDecode >>", data)
    except filters.DecodeError:
        pass  # failure is the expected non-exceptional outcome


@settings(derandomize=True, max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_ascii85_numpy_matches_stdlib(raw):
    # the vectorized fast path must invert stdlib a85encode exactly
    import base64

    from pdftotext_spark.core.filters import ascii85_decode

    assert ascii85_decode(base64.a85encode(raw)) == raw


@settings(derandomize=True, max_examples=150, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz._", min_size=1, max_size=24))
def test_glyph_to_char_total(name):
    # any name resolves to a string (never raises), with '?' as the
    # unknown fallback
    from pdftotext_spark.core.glyphs import glyph_to_char

    out = glyph_to_char(name)
    assert isinstance(out, str)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(
    st.text(
        alphabet="あいうえおかきくけこ漢字亜腕熙ABC abc012亞",  # mix incl. non-Japan1
        min_size=0,
        max_size=30,
    )
)
def test_japan1_table_roundtrip(text):
    # every char with a reverse CID maps back to itself through the
    # forward table (the builder/extractor consistency the roundtrip
    # oracle relies on)
    from pdftotext_spark.core.cjk_cid import (
        adobe_japan1_reverse,
        adobe_japan1_subset,
    )

    fwd, rev = adobe_japan1_subset().plain, adobe_japan1_reverse()
    for c in text:
        cid = rev.get(c)
        if cid is not None:
            assert fwd[cid] == c


@settings(derandomize=True, max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["layout", "rtl", "max_pages", "no_hyphenated_words"]),
        st.one_of(st.booleans(), st.integers(-3, 3)),
        max_size=4,
    )
)
def test_options_from_json_accepts_known_fields(spec):
    from pdftotext_spark.core.document import options_from_json

    opts = options_from_json(spec)
    for k, v in spec.items():
        assert getattr(opts, k) == v
