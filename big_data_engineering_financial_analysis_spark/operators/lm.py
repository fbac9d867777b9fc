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
) -> DataFrame:
    """Per-document bigram perplexity + keep flag (ppl <= threshold).

    Output: (id, n_bigrams, avg_logp, ppl, keep).  Documents with fewer
    than two tokens have no bigrams and report NULL metrics with
    keep = 0 (nothing to attest fluency)."""
    # the bigram stream feeds four aggregations + the scoring join; it is
    # row-local (no Exchange) but persisting it still saves four scans +
    # explodes of the corpus
    bg = doc_bigrams(df, id_col, text_col).persist()
    unigrams = (
        bg.select(F.col("w1").alias("w"))
        .union(bg.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    # c(w1) as bigram-PREFIX count keeps the conditional distribution
    # properly normalized: sum_w2 P(w2|w1) = 1 under add-one smoothing
    prefix = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pairs = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))

    # fold the model to ONE distinct-bigram-sized table first, so the
    # fact-scale stream joins once, not once per model component
    model = (
        pairs.join(prefix, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
            ).alias("logp"),
        )
    )
    scored = bg.join(model, ["w1", "w2"])
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
