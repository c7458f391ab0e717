"""Constructed-input semantic tests for the text-cleanup trio:
encoding_quality (mojibake/control panel), text_normalize (unicode
canonicalizer), strip_repeated_lines (within-document line dedup).
The DuckDB value twins run in test_oracle_parity via the registry;
these pin the SEMANTICS on inputs built to trip each rule (the
blind-oracle lesson: parity alone cannot catch a bug implemented
identically in both engines)."""

import pytest

from pdftotext_spark.operators import textstats as ts

pytestmark = pytest.mark.spark


# ------------------------------------------------- encoding_quality


def _enc(spark, rows):
    return {
        r.doc_id: r
        for r in ts.encoding_quality_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_encoding_clean_doc_passes(spark):
    r = _enc(spark, [(1, "perfectly ordinary ascii text with tabs\tand\nlines")])[1]
    assert r.keep
    assert (r.n_replacement, r.n_mojibake, r.n_control) == (0, 0, 0)
    assert r.anomaly_ratio == 0.0


def test_encoding_replacement_char_counted(spark):
    r = _enc(spark, [(1, "one bad � char and another � here")])[1]
    assert r.n_replacement == 2
    assert not r.keep


def test_encoding_mojibake_markers_hand_checked(spark):
    # 'â€œ' carries the 'â€' marker, 'â€' alone carries it again,
    # and 'Ã©' is the doubled-é — 3 marker hits total
    text = "he said â€œhelloâ€ with a cafÃ© accent"
    r = _enc(spark, [(1, text)])[1]
    assert r.n_mojibake == 3
    assert not r.keep


def test_encoding_control_chars_counted_but_whitespace_exempt(spark):
    # BEL and NUL count; tab/newline/CR do not
    r = _enc(spark, [(1, "a\x07b\x00c\td\ne\rf")])[1]
    assert r.n_control == 2
    assert not r.keep


def test_encoding_ratio_threshold(spark):
    # one marker over >1000 chars stays under the 0.001 ratio
    r = _enc(spark, [(1, "x" * 2000 + "�")])[1]
    assert r.n_replacement == 1 and r.keep


def test_encoding_empty_doc_passes(spark):
    r = _enc(spark, [(1, "")])[1]
    assert r.keep and r.anomaly_ratio == 0.0


# --------------------------------------------------- text_normalize


def _norm(spark, rows):
    return {
        r.doc_id: r
        for r in ts.text_normalize_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_normalize_punctuation_map(spark):
    r = _norm(spark, [(1, "“smart” ‘quotes’ — dash …")])[1]
    assert r.text_norm == '"smart" \'quotes\' - dash ...'
    assert r.changed


def test_normalize_whitespace_and_controls(spark):
    # nbsp -> space, tab -> space, runs collapse, controls stripped,
    # ends trimmed; NEWLINES preserved
    r = _norm(spark, [(1, "  a  b\t\tc\x07d  \ne  ")])[1]
    assert r.text_norm == "a b cd \ne"
    assert r.n_chars_after == len("a b cd \ne")


def test_normalize_zero_width_strips(spark):
    r = _norm(spark, [(1, "so\u00adft\u200bze\ufeffro")])[1]
    assert r.text_norm == "softzero"


def test_normalize_clean_text_unchanged(spark):
    r = _norm(spark, [(1, "already clean text.\nwith two lines.")])[1]
    assert not r.changed
    assert r.n_chars_before == r.n_chars_after


def test_normalize_python_replay_randomized(spark):
    """Independent pure-Python replay (third engine)."""
    import random
    import re

    rng = random.Random(5)
    pool = list("abc \t ’“—…​\x07\n")
    rows = [
        (d, "".join(rng.choice(pool) for _ in range(rng.randint(0, 60))))
        for d in range(1, 30)
    ]
    got = _norm(spark, rows)

    def replay(t):
        for src, dst in ts.TEXT_NORMALIZE_MAP:
            t = t.replace(src, dst)
        t = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", t)
        t = re.sub(" {2,}", " ", t)
        return t.strip(" \n\r")

    for d, t in rows:
        assert got[d].text_norm == replay(t), (d, repr(t))


def test_normalize_idempotent_randomized(spark):
    """normalize(normalize(x)) == normalize(x) — canonical form is a
    fixed point (seeded fuzz over the full special-char pool)."""
    import random

    rng = random.Random(17)
    pool = list("ab .\n\t ’“—…​­\x07")
    rows = [
        (d, "".join(rng.choice(pool) for _ in range(rng.randint(0, 80))))
        for d in range(1, 40)
    ]
    once = {d: r.text_norm for d, r in _norm(spark, rows).items()}
    twice = _norm(spark, [(d, t) for d, t in once.items()])
    for d, t in once.items():
        assert twice[d].text_norm == t, (d, repr(t))
        assert not twice[d].changed


# --------------------------------------------- strip_repeated_lines


def _strip(spark, rows):
    return {
        r.doc_id: r
        for r in ts.strip_repeated_lines_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_strip_repeated_lines_keeps_first_and_blanks(spark):
    text = "nav bar\nbody one\nnav bar\n\n\nbody two\nnav bar"
    r = _strip(spark, [(1, text)])[1]
    assert r.text_clean == "nav bar\nbody one\n\n\nbody two"
    assert r.n_lines == 7 and r.n_removed == 2


def test_strip_repeated_lines_noop_on_unique_lines(spark):
    text = "first line\nsecond line\nthird line"
    r = _strip(spark, [(1, text)])[1]
    assert r.text_clean == text and r.n_removed == 0


def test_strip_repeated_lines_whitespace_blank_survives(spark):
    # a line of spaces is blank by trim and always survives
    text = "x\n  \nx\n  "
    r = _strip(spark, [(1, text)])[1]
    assert r.text_clean == "x\n  \n  "
    assert r.n_removed == 1


def test_strip_repeated_lines_empty_doc(spark):
    r = _strip(spark, [(1, "")])[1]
    assert r.text_clean == "" and r.n_lines == 1 and r.n_removed == 0


def test_strip_repeated_lines_python_replay_randomized(spark):
    """Independent pure-Python replay of the first-occurrence rule."""
    import random

    rng = random.Random(9)
    vocab = ["nav", "body", "foot", " ", ""]
    rows = []
    for d in range(1, 25):
        lines = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        rows.append((d, "\n".join(lines)))
    got = _strip(spark, rows)

    def replay(t):
        lines = t.split("\n")
        kept = [
            x
            for j, x in enumerate(lines)
            if x.strip() == "" or lines.index(x) == j
        ]
        return "\n".join(kept), len(lines) - len(kept)

    for d, t in rows:
        clean, removed = replay(t)
        assert got[d].text_clean == clean, (d, repr(t))
        assert got[d].n_removed == removed


def test_strip_repeated_lines_idempotent_randomized(spark):
    """Stripping a stripped document removes nothing further."""
    import random

    rng = random.Random(13)
    vocab = ["nav", "body", "foot", "x y", "", " "]
    rows = [
        (
            d,
            "\n".join(
                rng.choice(vocab) for _ in range(rng.randint(0, 14))
            ),
        )
        for d in range(1, 25)
    ]
    once = {d: r.text_clean for d, r in _strip(spark, rows).items()}
    twice = _strip(spark, [(d, t) for d, t in once.items()])
    for d, t in once.items():
        assert twice[d].text_clean == t, (d, repr(t))
        assert twice[d].n_removed == 0
