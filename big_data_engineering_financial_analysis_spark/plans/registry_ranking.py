"""Registry: document-ranking queries (TF-IDF keywords, BM25 retrieval).

Both run over the ``documents`` table with lowercased whitespace terms
(the same tokenization as ``functions/hashing.tokens``).  All corpus
scalars (N, total token count) are exact BIGINT sums, so the derived
doubles are bit-identical between Spark and DuckDB; formula evaluation
order is mirrored term-for-term (verified literal-by-literal — DuckDB
promotes the mixed decimal/int arithmetic here to DOUBLE and matches
IEEE evaluation exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.ranking import (
    bm25_topk,
    tfidf_top_terms,
)
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

#: Fixed BM25 query (mid-frequency corpus terms), pinned like the serving
#: queries' SYMBOL/T_START parameters.
BM25_QUERY = ["merge", "scan", "vector"]
TFIDF_K = 5
BM25_K = 20


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=TFIDF_K)
    return out.withColumn("tfidf", F.round("tfidf", 6))


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = bm25_topk(load_table(spark, sf_dir, "documents"), BM25_QUERY, k=BM25_K)
    return out.withColumn("bm25", F.round("bm25", 6))


QUERIES = {
    "tfidf_top_terms": q_tfidf,
    "bm25_search": q_bm25,
}

_TERMS_CTE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
terms AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term)
"""

ORACLES: dict[str, str] = {
    "tfidf_top_terms": _TERMS_CTE
    + f""",
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         (CAST(tf AS DOUBLE) / dl) * ln(CAST(n_docs AS DOUBLE) / df_t) AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, rank, round(tfidf, 6) AS tfidf
FROM ranked WHERE rank <= {TFIDF_K}
""",
    "bm25_search": _TERMS_CTE.replace(
        "SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term",
        "SELECT doc_id, term, count(*) AS tf FROM terms "
        + "WHERE term IN ('merge', 'scan', 'vector') GROUP BY doc_id, term",
    )
    + f""",
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '')) AS dl
  FROM documents
),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * tf * 2.2
           / (tf + 1.2 * (0.25 + 0.75 * dl
                          / (CAST(sum_dl AS DOUBLE) / n_docs))) AS contrib
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id, round(sum(contrib), 6) AS bm25
FROM scored GROUP BY doc_id
ORDER BY sum(contrib) DESC, doc_id
LIMIT {BM25_K}
""",
}
