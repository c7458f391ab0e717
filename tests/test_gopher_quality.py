"""Semantic tests for the Gopher quality-rule panel on CONSTRUCTED
documents — each rule is tripped by a document built to violate
exactly that rule (the oracle gate is blind to a bug implemented
identically in both engines, CLAUDE.md), with the expected flag
values computed by hand from the published thresholds."""

import pytest

from pdftotext_spark.operators import textstats as ts

pytestmark = pytest.mark.spark


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "home with great speed that nobody could have expected to see "
    "because the fox was very fast and the dog was very slow and the "
    "race was over before it began with the fox far ahead of the dog "
    "and that was that for the day with everyone happy"
)  # 62 words, all alphabetic, plenty of stopwords, mean len in range


def _rows(spark, rows):
    return {
        r.doc_id: r
        for r in ts.gopher_quality_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_good_document_passes_all_rules(spark):
    r = _rows(spark, [(1, GOOD)])[1]
    assert r.keep
    assert (
        r.ok_word_count
        and r.ok_word_len
        and r.ok_symbol_ratio
        and r.ok_line_shape
        and r.ok_alpha_words
        and r.ok_stopwords
    )
    assert r.n_words == 62


def test_word_count_bounds(spark):
    short = "the dog and the fox with that have be to of"  # 11 words < 50
    got = _rows(spark, [(1, short), (2, GOOD)])
    assert not got[1].ok_word_count and not got[1].keep
    assert got[2].ok_word_count


def test_mean_word_length_bounds(spark):
    # 50+ words of length 1 -> mean 1 < 3; stopword-rich base keeps
    # the other rules out of the way
    tiny = " ".join(["a"] * 60) + " the the"
    long_w = " ".join(["extraordinarily"] * 60) + " the the"  # mean ~14.9
    got = _rows(spark, [(1, tiny), (2, long_w), (3, GOOD)])
    assert not got[1].ok_word_len
    assert not got[2].ok_word_len
    assert got[3].ok_word_len
    assert got[2].mean_word_len > ts.GOPHER_MAX_WORD_LEN


def test_symbol_ratio_rules(spark):
    hashy = GOOD + " " + " ".join(["#"] * 10)  # 10 '#' / 72 words > 0.1
    elly = GOOD + " " + " ".join(["..."] * 10)
    got = _rows(spark, [(1, hashy), (2, elly), (3, GOOD)])
    assert not got[1].ok_symbol_ratio and not got[1].keep
    assert not got[2].ok_symbol_ratio
    assert got[3].ok_symbol_ratio
    assert got[1].hash_ratio > ts.GOPHER_MAX_HASH_RATIO


def test_line_shape_rules(spark):
    bullets = "\n".join(f"- {GOOD}" for _ in range(10))  # 100% bullet lines
    ells = "\n".join(
        [f"{GOOD} ..."] * 4 + [GOOD] * 6
    )  # 40% ellipsis-ended > 30%
    mixed = "\n".join([f"- {GOOD}"] * 8 + [GOOD] * 2)  # 80% <= 90% -> ok
    got = _rows(spark, [(1, bullets), (2, ells), (3, mixed), (4, GOOD)])
    assert not got[1].ok_line_shape and got[1].bullet_line_frac == 1.0
    assert not got[2].ok_line_shape and got[2].ellipsis_line_frac == 0.4
    assert got[3].ok_line_shape
    assert got[4].ok_line_shape
    # unicode ellipsis and '*' bullets count too
    uni = "\n".join([f"* {GOOD}"] * 10)
    ue = "\n".join([f"{GOOD} …"] * 5 + [GOOD] * 5)
    got2 = _rows(spark, [(5, uni), (6, ue)])
    assert got2[5].bullet_line_frac == 1.0
    assert got2[6].ellipsis_line_frac == 0.5


def test_alpha_word_fraction(spark):
    # 62 alpha words + 40 numeric -> 62/102 < 0.8
    nums = GOOD + " " + " ".join(str(i) for i in range(100, 140))
    got = _rows(spark, [(1, nums), (2, GOOD)])
    assert not got[1].ok_alpha_words and not got[1].keep
    assert got[2].ok_alpha_words and got[2].alpha_word_frac == 1.0


def test_stopword_occurrence_rule(spark):
    # >= 2 OCCURRENCES of the 8-word set (datatrove reading): one
    # 'the' fails, two pass — even when it is the same word twice
    base = " ".join(["fox"] * 60)
    got = _rows(
        spark,
        [(1, base), (2, base + " the"), (3, base + " the the"),
         (4, base + " the with")],
    )
    assert got[1].n_stopwords == 0 and not got[1].ok_stopwords
    assert got[2].n_stopwords == 1 and not got[2].ok_stopwords
    assert got[3].n_stopwords == 2 and got[3].ok_stopwords
    assert got[4].n_stopwords == 2 and got[4].ok_stopwords


def test_empty_and_zero_word_documents_emit_rows(spark):
    got = _rows(spark, [(1, ""), (2, "   ")])
    for d in (1, 2):
        r = got[d]
        assert r.n_words == 0 and not r.keep
        assert r.mean_word_len == 0.0 and r.alpha_word_frac == 0.0


def test_stopwords_match_whole_tokens_only(spark):
    # 'theme'/'andante' must not count as 'the'/'and'
    base = " ".join(["theme andante"] * 30)
    got = _rows(spark, [(1, base)])
    assert got[1].n_stopwords == 0


def test_registered_query_parity_shape(spark):
    """Registered wrapper: one row per document, keep is the exact
    conjunction of the six flags."""
    sf = "/root/testdata/sf0.001"
    rows = ts.gopher_quality(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.keep == (
            r.ok_word_count
            and r.ok_word_len
            and r.ok_symbol_ratio
            and r.ok_line_shape
            and r.ok_alpha_words
            and r.ok_stopwords
        )


# ------------------------------------------------- repetition panel


def _rep(spark, rows):
    return {
        r.doc_id: r
        for r in ts.gopher_repetition_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_repetition_good_doc_passes(spark):
    got = _rep(spark, [(1, GOOD)])[1]
    assert got.keep
    assert got.ok_dup_lines and got.ok_top_ngram and got.ok_dup_ngram
    assert got.dup_line_frac == 0.0


def test_top_bigram_char_fraction_hand_checked(spark):
    # "ab cd" repeated 5x + filler: top 2-gram "ab cd" (len 5) occurs
    # 5 times -> 25 chars over the text length; also trips 0.20
    text = "ab cd " * 5 + "x y z w v u t s q r"
    r = _rep(spark, [(1, text)])[1]
    exp = 25 / len(text)
    assert r.top_2gram_char_frac == pytest.approx(round(exp, 4))
    assert not r.ok_top_ngram and not r.keep


def test_dup_5gram_char_fraction_hand_checked(spark):
    # the 5-gram "a b c d e" (9 chars) appears twice in distinct
    # contexts; second occurrence counts as duplicate. Overlapping
    # derived dup 5-grams do not exist here because contexts differ.
    text = "a b c d e x1 x2 x3 a b c d e y1 y2 y3"
    r = _rep(spark, [(1, text)])[1]
    assert r.dup_5gram_char_frac == pytest.approx(round(9 / len(text), 4))
    # 9/37 = 0.2432 > 0.15 -> rule fires
    assert not r.ok_dup_ngram and not r.keep


def test_duplicate_line_rules_hand_checked(spark):
    # 4 lines, "same line" repeated 3x -> dup_line_cnt=2, frac=0.5;
    # dup chars = 2*len("same line")
    text = "same line\nsame line\nsame line\nunique and much longer line"
    r = _rep(spark, [(1, text)])[1]
    assert r.dup_line_frac == pytest.approx(0.5)
    assert r.dup_line_char_frac == pytest.approx(round(18 / len(text), 4))
    assert not r.ok_dup_lines and not r.keep


def test_repetition_empty_and_short_docs_pass(spark):
    got = _rep(spark, [(1, ""), (2, "one"), (3, "one two")])
    for d in (1, 2, 3):
        assert got[d].keep, d
        assert got[d].dup_10gram_char_frac == 0.0


def test_repetition_python_replay_randomized(spark):
    """Independent pure-Python replay of every panel statistic on a
    seeded random corpus (third engine vs the DuckDB twin)."""
    import random
    from collections import Counter

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = []
    for d in range(1, 25):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        if rng.random() < 0.4 and len(words) >= 6:
            words += words[:6]  # plant repetition
        rows.append((d, " ".join(words)))

    got = _rep(spark, rows)
    for d, text in rows:
        a = [w for w in text.lower().split(" ") if w]
        tc = max(len(text), 1)
        for n, col in [(2, "top_2gram_char_frac"), (4, "top_4gram_char_frac")]:
            grams = [" ".join(a[i : i + n]) for i in range(len(a) - n + 1)]
            cnt = Counter(grams)
            top = max(
                (c * len(g) for g, c in cnt.items() if c >= 2), default=0
            )
            assert getattr(got[d], col) == pytest.approx(
                round(top / tc, 4)
            ), (d, n)
        for n in (5, 10):
            grams = [" ".join(a[i : i + n]) for i in range(len(a) - n + 1)]
            cnt = Counter(grams)
            dup = sum((c - 1) * len(g) for g, c in cnt.items())
            assert getattr(
                got[d], f"dup_{n}gram_char_frac"
            ) == pytest.approx(round(dup / tc, 4)), (d, n)


# ------------------------------------------------------ C4 cleaning


def _c4(spark, rows):
    return {
        r.doc_id: r
        for r in ts.c4_quality_for(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


C4_GOOD = "\n".join(
    [
        "This is a perfectly reasonable first sentence.",
        "Here is another sentence that ends properly!",
        "Does this one end with a question mark?",
        'A quoted line can end with a quote."',
        "And one more plain terminal sentence.",
    ]
)


def test_c4_good_page_kept_and_cleaned_text_identity(spark):
    r = _c4(spark, [(1, C4_GOOD)])[1]
    assert r.keep
    assert r.n_lines == 5 and r.n_kept_lines == 5
    assert r.cleaned_text == C4_GOOD
    # 3 periods + 1 bang + 1 question = 5 sentences
    assert r.n_sentences == 5


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "No terminal punctuation here",  # dropped: no terminal
            "Too short.",  # dropped: < 3 words
            "This javascript line must be dropped.",  # dropped: js
            "This line is kept because it qualifies.",
        ]
    )
    r = _c4(spark, [(1, text)])[1]
    assert r.n_lines == 4 and r.n_kept_lines == 1
    assert r.cleaned_text == "This line is kept because it qualifies."
    assert not r.keep  # only 1 sentence < 5


def test_c4_page_rules(spark):
    lorem = C4_GOOD + "\nSome lorem ipsum filler appears here."
    brace = C4_GOOD + "\nfunction f() { return 1; }"
    got = _c4(spark, [(1, lorem), (2, brace), (3, C4_GOOD)])
    assert got[1].has_lorem_ipsum and not got[1].keep
    assert got[2].has_curly_brace and not got[2].keep
    assert got[3].keep


def test_c4_empty_text(spark):
    r = _c4(spark, [(1, "")])[1]
    assert r.n_kept_lines == 0 and r.cleaned_text == "" and not r.keep


# ------------------------------------------------------ panel vote


def test_quality_vote_matches_standalone_panels(spark):
    """quality_vote's per-policy flags must equal the standalone
    operators' keeps doc-by-doc, and the compositions must be exact
    functions of the votes (the curation_pipeline coherence rule)."""
    from pdftotext_spark.operators import curation

    sf = "/root/testdata/sf0.001"
    vote = {r.doc_id: r for r in curation.quality_vote(spark, sf).collect()}
    gq = {r.doc_id: r.keep for r in ts.gopher_quality(spark, sf).collect()}
    gr = {
        r.doc_id: r.keep for r in ts.gopher_repetition(spark, sf).collect()
    }
    c4 = {r.doc_id: r.keep for r in ts.c4_quality(spark, sf).collect()}
    assert set(vote) == set(gq) == set(gr) == set(c4)
    for d, r in vote.items():
        assert r.keep_gopher_quality == gq[d]
        assert r.keep_gopher_repetition == gr[d]
        assert r.keep_c4 == c4[d]
        n = sum(
            [r.keep_shallow, r.keep_gopher_quality,
             r.keep_gopher_repetition, r.keep_c4]
        )
        assert r.n_keep_votes == n
        assert r.keep_all == (n == 4)
        assert r.keep_majority == (n >= 3)
    # the panels must disagree somewhere at this sf or the vote is
    # degenerate evidence
    assert len({
        (r.keep_shallow, r.keep_gopher_quality,
         r.keep_gopher_repetition, r.keep_c4)
        for r in vote.values()
    }) > 1
