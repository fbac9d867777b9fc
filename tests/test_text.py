"""Edge-case tests for the Gopher-style repetition filters.

The oracle test (driver contract ``text_repetition``) proves Spark == SQL
on the real corpus; these prove the hand-computable semantics on planted
degenerate documents — short docs (no bigrams/trigrams), ties, and
all-duplicate pathological pages.
"""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.operators.text import with_repetition


@pytest.fixture(scope="module")
def rep(spark):
    rows = [
        (1, "solo"),                       # 1 token: no bigrams, no trigrams
        (2, "a a a b"),                    # max token a x3; top bigram "a a" x2
        (3, "x y z x y z x y z"),          # every trigram duplicated
        (4, "b a b a"),                    # bigram tie: "a b" x1 vs "b a" x2
        (5, "p q"),                        # bigrams yes, trigrams no
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_repetition(df).select(
        "doc_id", "max_token_ratio", "top_bigram_char_ratio", "dup_trigram_char_ratio"
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_single_token_doc(rep):
    r = rep[1]
    assert r["max_token_ratio"] == 1.0
    assert r["top_bigram_char_ratio"] is None
    assert r["dup_trigram_char_ratio"] is None


def test_max_token_and_top_bigram(rep):
    r = rep[2]
    # "a" occurs 3 of 4 tokens
    assert r["max_token_ratio"] == 0.75
    # bigrams: "a a" x2, "a b" x1 -> top covers 2*3=6 chars of 7
    assert r["top_bigram_char_ratio"] == round(6 / 7, 6)
    # trigrams: "a a a", "a a b" -> no duplicates
    assert r["dup_trigram_char_ratio"] == 0.0


def test_all_trigrams_duplicated(rep):
    r = rep[3]
    # every trigram duplicated -> the UNION of covered spans is the whole
    # text: exactly 1.0, never above (the pre-r9 count*len form reported
    # 35/17 = 2.06 by counting shared characters once per occurrence —
    # the double-counting the Gopher char-mask rule forbids)
    assert r["dup_trigram_char_ratio"] == 1.0


def test_bigram_tie_breaks_lexicographically(rep):
    r = rep[4]
    # bigrams: "b a" x2, "a b" x1 -> max is unique here ("b a")
    assert r["top_bigram_char_ratio"] == round(2 * 3 / 7, 6)


def test_two_tokens_no_trigram(rep):
    r = rep[5]
    assert r["top_bigram_char_ratio"] == round(3 / 3, 6)
    assert r["dup_trigram_char_ratio"] is None


# --- C4-style scrub (with_scrub / page_scrub_ok) -------------------------


@pytest.fixture(scope="module")
def scrubbed(spark):
    from big_data_engineering_financial_analysis_spark.operators.text import with_scrub

    rows = [
        # 3 sentence-like lines, all >= 5 words -> clean page
        (1, "this is a good sentence.\nhere is another fine one!\nand a third proper line?"),
        # ends with punct+closing quote -> kept; short line dropped
        (2, 'he said it was truly "done."\ntoo short.\nthe last line has five words.\nanother one with enough words here.'),
        # no terminal punctuation anywhere -> zero kept lines
        (3, "just a bag of words with no punctuation at all"),
        # brace page (code/boilerplate)
        (4, "a perfectly fine sentence here.\nsecond good sentence right here.\nthird good sentence is here.\nfunction f() { return 1; }"),
        # placeholder page
        (5, "Lorem Ipsum dolor sit amet consectetur.\nanother good long sentence here.\na third quite long sentence here."),
        # PII-ish page
        (6, "contact me at someone@example.com for details.\nanother good long sentence here.\na third quite long sentence here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in with_scrub(df).collect()}


def test_scrub_clean_page_keeps_all_lines(scrubbed):
    r = scrubbed[1]
    assert (r["n_lines"], r["n_kept_lines"], r["scrub_ok"]) == (3, 3, 1)
    assert r["scrubbed_text"] == r["text"]


def test_scrub_line_rules(scrubbed):
    r = scrubbed[2]
    # "too short." fails the min-words rule; quote-terminated line kept
    assert r["n_lines"] == 4 and r["n_kept_lines"] == 3
    assert "too short." not in r["scrubbed_text"]
    assert 'he said it was truly "done."' in r["scrubbed_text"]
    assert r["scrub_ok"] == 1


def test_scrub_no_punctuation_page_dropped(scrubbed):
    r = scrubbed[3]
    assert r["n_kept_lines"] == 0 and r["scrubbed_text"] == "" and r["scrub_ok"] == 0


def test_scrub_page_flags(scrubbed):
    assert scrubbed[4]["has_brace"] == 1 and scrubbed[4]["scrub_ok"] == 0
    assert scrubbed[5]["has_lorem"] == 1 and scrubbed[5]["scrub_ok"] == 0
    assert scrubbed[6]["has_email"] == 1 and scrubbed[6]["scrub_ok"] == 0
    # the flagged line itself still participates in line stats
    assert scrubbed[4]["n_kept_lines"] == 3


def test_page_scrub_ok_predicate(spark):
    from big_data_engineering_financial_analysis_spark.operators.text import page_scrub_ok

    long_ok = " ".join(["word"] * 25) + "."
    rows = [
        (1, long_ok),                                   # keep
        (2, "short doc under the floor"),               # word floor
        (3, long_ok + " { brace"),                      # brace
        (4, long_ok + " lorem ipsum"),                  # placeholder
        (5, long_ok + " a@b.com"),                      # email
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in df.filter(page_scrub_ok("text")).collect())
    assert kept == [1]
