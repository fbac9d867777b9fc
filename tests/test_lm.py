"""Bigram-LM perplexity semantics on crafted corpora."""

from __future__ import annotations

import math


def _score(spark, docs, threshold=30.0):
    from big_data_engineering_financial_analysis_spark.operators.lm import (
        perplexity_score,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in perplexity_score(df, threshold=threshold).collect()
    }


def test_single_token_doc_has_no_bigrams(spark):
    out = _score(spark, [(1, "hello"), (2, "a b a b a b")])
    assert out[1]["n_bigrams"] == 0
    assert out[1]["avg_logp"] is None
    assert out[1]["keep"] == 0
    assert out[2]["n_bigrams"] == 5


def test_repetitive_doc_scores_lower_perplexity(spark):
    """A doc made of the corpus's dominant bigram is more predictable
    than one of rare transitions."""
    docs = [
        (1, "the cat " * 20),           # dominant pattern
        (2, "zebra quark mango fjord"),  # every transition seen once
        (3, "the cat " * 20),
    ]
    out = _score(spark, docs)
    assert out[1]["ppl"] < out[2]["ppl"]
    assert out[1]["ppl"] == out[3]["ppl"]  # identical docs, identical score


def test_hand_computed_two_doc_corpus(spark):
    """Tiny corpus small enough to verify the smoothed model by hand."""
    out = _score(spark, [(1, "a b"), (2, "a b")])
    # bigrams: (a,b) x2; prefix c(a)=2; vocab {a, b} -> V=2
    # P(b|a) = (2+1)/(2+2) = 0.75; avg_logp = ln(0.75); ppl = 1/0.75
    want = math.log(0.75)
    assert abs(out[1]["avg_logp"] - round(want, 6)) < 1e-9
    assert abs(out[1]["ppl"] - round(1 / 0.75, 6)) < 1e-9


def test_keep_flag_respects_threshold(spark):
    docs = [(1, "x y " * 10)]
    hi = _score(spark, docs, threshold=1e9)
    lo = _score(spark, docs, threshold=1.0)
    assert hi[1]["keep"] == 1 and lo[1]["keep"] == 0
