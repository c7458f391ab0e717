"""Dual-mode equivalence (SURVEY.md §5.2): raw-mode and layout-mode
extraction must agree on the generator corpus — two independent
interpreter implementations (T5 vs T6+L2–L4) cross-check each other,
and both must equal the construction golden."""

import base64

import pytest

from pdftotext_spark.core.document import ExtractOptions, extract_document
from pdftotext_spark.core.dispatch import B64_SENTINEL
from pdftotext_spark.sources.transcripts_gen import generate_rows


def _pdf_bytes(payload: str) -> bytes | None:
    if payload.startswith(B64_SENTINEL):
        return base64.b64decode(payload[len(B64_SENTINEL) :])
    if payload.startswith("%PDF"):
        return payload.encode("latin-1")
    return None


@pytest.mark.parametrize("seed", [21, 22])
def test_raw_and_layout_agree_on_corpus(seed):
    rows, goldens = generate_rows(250, seed=seed)
    checked = 0
    for r, g in zip(rows, goldens):
        buf = _pdf_bytes(r["text"])
        if buf is None:
            continue
        raw = extract_document(buf)
        lay = extract_document(buf, ExtractOptions(layout=True))
        assert raw.text == g["expected_text"], r["tool"]
        assert lay.text == g["expected_text"], r["tool"]
        assert raw.decode_failures == lay.decode_failures == 0
        checked += 1
    assert checked >= 80  # corpus actually contained PDFs
