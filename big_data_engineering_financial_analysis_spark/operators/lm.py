"""N-gram language-model perplexity scoring for corpus filtering.

The CCNet recipe (Wenzek et al. 2020) ranks web documents by the
perplexity of a language model trained on a trusted corpus and keeps
the low-perplexity (fluent) tail.  This module implements the
distributed version with a bigram model and add-one smoothing:

  P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

* **Training** is two grouped counts (bigram and unigram tables) plus a
  scalar vocabulary size — classic map-side-combined aggregations; the
  model tables shuffle KEYED on the n-gram, deliberately not broadcast
  (a web-corpus vocabulary does not fit an executor, same call as the
  TF-IDF join in ``operators/ranking.py``).
* **Scoring** joins each document's bigram stream to the model and
  folds per-document log-probabilities **in token order** via
  ``aggregate(array_sort(collect_list(struct(pos, logp))))`` — the
  DuckDB mirror is ``list_reduce(list(logp ORDER BY pos))`` — so the
  mean log-prob and perplexity are bit-identical across engines and
  physical layouts (a bare SUM of doubles would be order-dependent).

Here the model trains on the corpus being scored (self-perplexity);
production use trains the counts on a reference corpus and scores the
candidate corpus — the tables and joins are identical, only the source
of the count frames changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import tokens


def doc_bigrams(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Positioned bigram stream: (id, pos, w1, w2) per adjacent token
    pair of the lowercased whitespace tokenization.

    ROW-LOCAL: adjacent pairs are sliced out of the per-row token array
    (``transform(sequence(...))`` + explode) — never a doc-keyed window.
    The first formulation used ``lead() OVER (PARTITION BY doc)``, which
    shuffles every token by doc id; since the model build re-reads this
    frame several times, that shuffle multiplied into the dominant cost
    at 10x scale (the row-local rewrite + one persist took the query
    36 s → 10 s at sf1x)."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            (i - 1).alias("pos"),
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    guarded = F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<struct<pos:int,w1:string,w2:string>>")
    )
    return df.select(id_col, F.explode(guarded).alias("bg")).select(
        id_col, "bg.pos", "bg.w1", "bg.w2"
    )


def perplexity_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 30.0,
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram perplexity + keep flag (ppl <= threshold).

    ``model_df`` is the corpus the counts are trained on; the default
    (None) self-scores ``df`` — the oracle-checked mode.  Production use
    passes the REFERENCE corpus here and the candidate corpus as ``df``.

    The scoring join is TOTAL: add-one smoothing means every bigram has
    a probability, so unseen pairs must score ln(1/(c1+V)) and unseen
    prefixes ln(1/V) — an inner join would silently drop exactly the
    disfluent bigrams the CCNet filter exists to punish, biasing their
    documents' perplexity LOW (invisible when self-scoring, where every
    stream bigram is in the model by construction).

    Output: (id, n_bigrams, avg_logp, ppl, keep).  Documents with fewer
    than two tokens have no bigrams and report NULL metrics with
    keep = 0 (nothing to attest fluency).

    The bigram persist is caller-owned (the returned lazy frame
    references it several times within one action), same lifetime rule
    as ``similarity.cosine_topk``'s normed-corpus cache."""
    # the bigram stream feeds the scoring joins (and, when self-scoring,
    # four model aggregations); it is row-local (no Exchange) but
    # persisting it still saves the repeated scans + explodes
    bg = doc_bigrams(df, id_col, text_col).persist()
    mbg = bg if model_df is None else doc_bigrams(model_df, id_col, text_col)
    unigrams = (
        mbg.select(F.col("w1").alias("w"))
        .union(mbg.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    # c(w1) as bigram-PREFIX count keeps the conditional distribution
    # properly normalized: sum_w2 P(w2|w1) = 1 under add-one smoothing
    prefix = mbg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pairs = mbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))

    # left joins keyed on the distinct-bigram / distinct-prefix tables;
    # unseen counts coalesce to 0 so the add-one formula covers the
    # whole stream (bit-identical to the folded inner-join form whenever
    # every stream bigram is in the model, i.e. self-scoring)
    scored = (
        bg.join(pairs, ["w1", "w2"], "left")
        .join(prefix, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("sum_logp"),
    )
    per_doc = per_doc.withColumn(
        "avg_logp", F.col("sum_logp") / F.col("n_bigrams")
    ).withColumn("ppl", F.exp(-F.col("avg_logp")))
    out = df.select(id_col).join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("ppl", 6).alias("ppl"),
        F.when(F.col("ppl") <= threshold, 1).otherwise(0).alias("keep"),
    )
