"""Batched model-scoring hook: deterministic classifier inference over
feature columns via an Arrow-batched pandas UDF.

This is the shape every fasttext-style corpus quality filter needs — and
the same shape the multimodal path reuses for real model inference:
features computed JVM-side, a broadcast weight vector, and one vectorized
Python pass per Arrow batch (never per row).  Swapping the linear scorer
for a real model (fasttext, an ONNX session, a torch module) changes only
the function body; the Spark plumbing — column signature, Arrow batching,
scale behavior (row-local, zero shuffle) — is identical and is what this
module proves.

Determinism contract: the scorer uses only +, *, /, abs (a rational
sigmoid ``0.5 + 0.5 * z / (1 + |z|)`` instead of ``exp``-based logistic),
evaluated in a fixed left-to-right order — bit-identical IEEE-754 between
numpy and the DuckDB oracle, which ``exp`` (libm-dependent) could not
guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: default quality-classifier weights over text.with_quality features
#: (+ length_score): favors long, stopword-dense, punctuation-light text.
#: In production this is the learned artifact, shipped exactly like this —
#: a broadcast literal.
DEFAULT_WEIGHTS: dict[str, float] = {
    "length_score": 2.0,
    "stopword_ratio": 3.0,
    "punct_ratio": -4.0,
}
DEFAULT_BIAS = -1.5


def with_classifier_score(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
    out_col: str = "clf_score",
) -> DataFrame:
    """Score ``sigmoid_rational(bias + sum_i w_i * f_i)`` in (0, 1) from
    the feature columns named by ``weights`` (NULL features read as 0).

    The accumulation order is the dict's iteration order — fixed, so the
    oracle can replay the identical float expression.
    """
    weights = DEFAULT_WEIGHTS if weights is None else weights
    names = list(weights)
    ws = [float(weights[n]) for n in names]
    b = float(bias)
    if not names:  # zero features: the constant sigmoid_rational(bias),
        # matching duck_classifier_score({}) (a zero-arg pandas UDF
        # cannot even size its output batch)
        const = 0.5 + 0.5 * (b / (1.0 + abs(b)))
        return df.withColumn(out_col, F.round(F.lit(const), 6))

    @pandas_udf("double")
    def _score(*cols):
        import numpy as np
        import pandas as pd

        z = np.full(len(cols[0]), b, dtype="float64")
        for w, c in zip(ws, cols):
            z = z + w * c.to_numpy(dtype="float64")
        return pd.Series(0.5 + 0.5 * (z / (1.0 + np.abs(z))))

    inputs = [F.coalesce(F.col(n), F.lit(0.0)).cast("double") for n in names]
    return df.withColumn(out_col, F.round(_score(*inputs), 6))


def duck_classifier_score(
    weights: dict[str, float] | None = None, bias: float = DEFAULT_BIAS
) -> str:
    """DuckDB SQL twin of :func:`with_classifier_score`'s scorer over
    identically-named feature columns — generated from the same weights
    so the two can never drift."""
    weights = DEFAULT_WEIGHTS if weights is None else weights
    z = repr(float(bias))
    for n, w in weights.items():
        z = f"({z} + {float(w)!r} * coalesce({n}, 0.0))"
    return f"round(0.5 + 0.5 * ({z} / (1.0 + abs({z}))), 6)"
