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
    # trigrams: "x y z" x3, "y z x" x2, "z x y" x2 -> 7*5=35 chars of 17
    assert r["dup_trigram_char_ratio"] == round(35 / 17, 6)


def test_bigram_tie_breaks_lexicographically(rep):
    r = rep[4]
    # bigrams: "b a" x2, "a b" x1 -> max is unique here ("b a")
    assert r["top_bigram_char_ratio"] == round(2 * 3 / 7, 6)


def test_two_tokens_no_trigram(rep):
    r = rep[5]
    assert r["top_bigram_char_ratio"] == round(3 / 3, 6)
    assert r["dup_trigram_char_ratio"] is None
