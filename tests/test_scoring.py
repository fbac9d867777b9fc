"""Batched classifier scoring: UDF vs native-expression parity, NULLs,
custom weights."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.scoring import (
    DEFAULT_BIAS,
    DEFAULT_WEIGHTS,
    with_classifier_score,
)


def _expected(feats: dict[str, float | None], weights=DEFAULT_WEIGHTS, bias=DEFAULT_BIAS):
    z = bias
    for n, w in weights.items():
        z = z + w * (feats.get(n) or 0.0)
    return round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6)


def test_scores_match_reference_formula(spark):
    rows = [
        (1, 1.0, 0.4, 0.05),
        (2, 0.2, 0.0, 0.5),
        (3, 0.5, 0.25, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, length_score double, stopword_ratio double, punct_ratio double"
    )
    got = {r["doc_id"]: r["clf_score"] for r in with_classifier_score(df).collect()}
    for doc_id, ls, sr, pr in rows:
        exp = _expected({"length_score": ls, "stopword_ratio": sr, "punct_ratio": pr})
        assert math.isclose(got[doc_id], exp, rel_tol=0, abs_tol=0), (doc_id, got[doc_id], exp)


def test_null_features_read_as_zero(spark):
    df = spark.createDataFrame(
        [(1, None, None, None)],
        "doc_id long, length_score double, stopword_ratio double, punct_ratio double",
    )
    (row,) = with_classifier_score(df).collect()
    assert row["clf_score"] == _expected({})


def test_custom_weights_and_bounds(spark):
    """Scores stay strictly inside (0, 1) even for extreme z."""
    weights = {"x": 1000.0}
    df = spark.createDataFrame([(1, 50.0), (2, -50.0)], "doc_id long, x double")
    got = {r["doc_id"]: r["clf_score"] for r in
           with_classifier_score(df, weights=weights, bias=0.0).collect()}
    assert 0.99 < got[1] < 1.0
    assert 0.0 < got[2] < 0.01
