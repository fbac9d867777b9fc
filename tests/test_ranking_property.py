"""Property-based BM25 / TF-IDF checks against pure-Python models.

Few hypothesis examples (Spark-job cost per example); the fixed-corpus
exact parity lives in the DuckDB oracle queries.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.operators.ranking import (
    bm25_topk,
    tfidf_top_terms,
)

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
DOC = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)
QUERY = ["alpha", "gamma"]


def _bm25_model(texts: list[str], query: list[str], k1=1.2, b=0.75):
    docs = [t.split() for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    dfreq = Counter()
    for d in docs:
        for t in set(d) & set(query):
            dfreq[t] += 1
    scores = {}
    for i, d in enumerate(docs):
        tf = Counter(d)
        s = 0.0
        for t in query:
            if tf[t] == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf[t] * (k1 + 1.0) / (
                tf[t] + k1 * ((1.0 - b) + b * len(d) / avgdl)
            )
        if s > 0.0:
            scores[i] = s
    return scores


@settings(max_examples=8, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=8))
def test_bm25_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, QUERY, k=len(texts)).collect()
    }
    exp = _bm25_model(texts, QUERY)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-12), (i, texts)


@settings(max_examples=6, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=6))
def test_tfidf_rank1_is_best_term(spark, texts):
    """The rank-1 term per doc maximizes the model tf-idf (ties on term)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = len(texts)
    docs = [t.split() for t in texts]
    dfreq = Counter()
    for d in docs:
        for t in set(d):
            dfreq[t] += 1

    out = tfidf_top_terms(df, k=1).collect()
    assert len(out) == n
    for r in out:
        d = docs[r["doc_id"]]
        tf = Counter(d)
        model = {
            t: (tf[t] / len(d)) * math.log(n / dfreq[t]) for t in tf
        }
        best = min(sorted(model), key=lambda t: (-model[t], t))
        assert r["term"] == best, (r, model)
        assert r["tfidf"] == pytest.approx(model[best], rel=1e-12)
