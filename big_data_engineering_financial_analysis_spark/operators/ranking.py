"""Document ranking: TF-IDF term extraction and BM25 retrieval.

The training-data side of the engine filters corpora (dedup, quality,
decontamination); ranking is the retrieval half a corpus pipeline needs —
"which documents match this query" (BM25, the classic probabilistic
ranking function; Robertson & Zaragoza 2009) and "which terms characterize
this document" (TF-IDF keywords, the standard tf*idf weighting).

Scale design (100 TB):

* terms come from one ``explode`` of whitespace tokens; term statistics are
  keyed ``groupBy`` aggregations with map-side partial combine — no
  all-pairs anything;
* TF-IDF joins the per-(doc,term) tf frame to the per-doc length on
  ``doc_id`` and to the per-term document frequency on ``term`` — both
  plain keyed shuffles that AQE sizes; the vocabulary side is NOT assumed
  broadcastable (web-scale vocab is huge);
* BM25 filters the exploded terms to the query's terms *before* any
  aggregation, so the per-term work is proportional to query-term
  postings, not corpus size; the per-query-term df table is a handful of
  rows and IS broadcast; document length comes from ``size(tokens)`` on
  the document row — no second explode, no extra shuffle;
* corpus-level scalars (N, avg doc length) are exact integer sums (token
  counts as BIGINT), so the derived doubles are bit-identical across
  engines and summation orders.

Determinism: ranking ties break on the unique key (``term`` within a
document, ``doc_id`` across documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _term_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token occurrence: (id, term) — lowercased whitespace
    tokens, empty strings dropped (split('') artifacts on blank text)."""
    return df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.

    tfidf(t, d) = (tf_td / |d|) * ln(N / df_t); ties break on term.
    Returns (id, term, rank, tfidf).
    """
    terms = _term_rows(df, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc length from the document row itself (== sum(tf) per doc), not
    # from a second pass over the exploded postings: Spark plans share no
    # common subtrees, so deriving dl from tf would re-explode the corpus
    dl = df.select(
        F.col(id_col),
        F.size(
            F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != F.lit(""))
        ).cast("long").alias("dl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))

    scored = (
        tf.join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") / F.col("dl"))
            * F.log(F.col("n_docs").cast("double") / F.col("df_t")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "rank", "tfidf")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by BM25.

    score(d) = sum over query terms t of
      idf_t * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * |d| / avgdl))
    with idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)).

    Only documents containing at least one query term appear (standard
    inverted-index semantics).  Ties break on id.
    """
    # posting terms are lowercased by _term_rows, so query terms must
    # normalize the same way — an uppercase query term would otherwise
    # silently match nothing
    qts = sorted({t.lower() for t in query_terms})
    with_dl = df.select(
        F.col(id_col),
        F.size(
            F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != F.lit(""))
        ).alias("dl"),
        F.col(text_col),
    )
    terms = _term_rows(with_dl, id_col, text_col).filter(F.col("term").isin(qts))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # N and avgdl: exact integer sums -> engine-order-independent doubles
    stats = with_dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    scored = (
        tf.join(with_dl.select(id_col, "dl"), id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("dl")
                    / (F.col("sum_dl").cast("double") / F.col("n_docs"))
                )
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("contrib").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
