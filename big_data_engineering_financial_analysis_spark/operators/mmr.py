"""Maximal Marginal Relevance (MMR) diversified retrieval.

Carbonell & Goldstein 1998: greedily pick results that are relevant to
the query but NOT redundant with what's already picked —

  MMR(d) = λ · rel(d) − (1 − λ) · max_{s ∈ selected} sim(d, s)

The training-data reading: when assembling examples from a near-dup-
heavy corpus, pure top-k returns k copies of the same passage; MMR
returns the k *distinct* best ones.

Two-tier scale split (the engine's pagerank/triangles pattern):

1. **Relevance shortlist** — exact cosine top-``shortlist`` against the
   query: one corpus scan, broadcast query, per-query top-k rank.  This
   is the only fact-scale work.
2. **Greedy selection** — ``k`` unrolled steps over the shortlist
   (tens of rows).  Each step joins the remaining candidates to the
   selected set, takes max-similarity (exact comparisons — order-free),
   scores, and picks the argmax with a deterministic (score desc, id)
   tie-break.  Step 1 is pure relevance (empty selected set ⇒ the
   penalty term is 0 by definition).

Cosines use the engine's sequential-fold dot product, so every score is
bit-identical to the DuckDB oracle built by :func:`mmr_oracle_sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.similarity import (
    cosine,
    spread,
    with_norm,
)


def mmr_select(
    corpus: DataFrame,
    query_id: int,
    k: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR top-``k`` for one query vector.  Output:
    (pick_order, vec_id, rel, mmr) — ``rel`` the cosine to the query,
    ``mmr`` the score at selection time."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    )
    c = with_norm(spread(c), "vec").persist()
    q = c.filter(F.col(id_col) == query_id).select(
        F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .withColumn(
            "rel", cosine(F.col("vec"), F.col("qvec"), F.col("norm"), F.col("qnorm"))
        )
    )
    # Top-shortlist via orderBy+limit — compiles to TakeOrderedAndProject
    # (per-partition top-k, then a k-per-partition merge), NOT the
    # row_number-over-global-window form, which would move the whole
    # scored corpus to one reducer just to rank it.  Deterministic under
    # ties via the id tiebreak, so the shortlist set is identical.
    cand_df = (
        scored.orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(shortlist)
        .select(id_col, "vec", "norm", "rel")
    )

    # The greedy runs on the SHORTLIST — model-sized by construction
    # (tens of rows), so it belongs driver-side, like the engine's other
    # model-sized collects (k-means partials, API 1-row aggregates).
    # Keeping it as unrolled DataFrame steps cost 5 scheduler
    # round-trips per query (measured 17.7 s; persist cut it to 4 s;
    # this collect form runs in ~1 s — the corpus-scale cosine scan).
    # Arithmetic below replicates the engine fold exactly: dot products
    # accumulate in element order from a 0.0 seed, so scores stay
    # bit-identical to the oracle's list_reduce.
    cand = [
        (r[id_col], list(r["vec"]), r["norm"], r["rel"])
        for r in cand_df.collect()
    ]
    c.unpersist()  # collect-terminated: the cache is dead from here on

    def dot(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    # NULL contract mirrors the oracle exactly: a NULL rel/mmr (zero-norm
    # query or all-zero-norm selected pairs) sorts LAST (DuckDB DESC
    # default) but stays PICKABLE — the oracle's ORDER BY ... LIMIT 1
    # still emits a row when only NULL-score candidates remain, so
    # skipping them here would return fewer picks than the oracle.
    def desc_nulls_last(score, cid):
        return (score is None, -(score if score is not None else 0.0), cid)

    selected: list[tuple] = []  # (pick_order, id, vec, norm, rel, mmr)
    if cand:
        remaining = sorted(cand, key=lambda c: desc_nulls_last(c[3], c[0]))
        first = remaining.pop(0)
        selected.append(
            (1, first[0], first[1], first[2], first[3],
             lam * first[3] if first[3] is not None else None)
        )
        for step in range(2, min(k, len(cand)) + 1):
            best = None
            for cid, cvec, cnorm, crel in remaining:
                sims = [
                    dot(cvec, svec) / (cnorm * snorm)
                    for _, _, svec, snorm, _, _ in selected
                    if cnorm is not None and snorm is not None
                    and cnorm * snorm != 0.0
                ]
                mmr = (
                    lam * crel - (1.0 - lam) * max(sims)
                    if sims and crel is not None
                    else None
                )
                if best is None or desc_nulls_last(mmr, cid) < desc_nulls_last(
                    best[5], best[1]
                ):
                    best = (step, cid, cvec, cnorm, crel, mmr)
            if best is None:
                break
            remaining = [c for c in remaining if c[0] != best[1]]
            selected.append(best)

    spark = corpus.sparkSession
    out = spark.createDataFrame(
        [
            (order, cid, rel, mmr)
            for order, cid, _, _, rel, mmr in selected
        ],
        f"pick_order int, {id_col} long, rel double, mmr double",
    )
    return out.select(
        "pick_order",
        id_col,
        F.round("rel", 6).alias("rel"),
        F.round("mmr", 6).alias("mmr"),
    )


_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]),"
    " (acc, v) -> acc + v)"
)


def mmr_oracle_sql(
    query_id: int,
    k: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
) -> str:
    """DuckDB twin: identical shortlist + unrolled greedy steps (the
    pagerank-style CTE chain).  λ and 1−λ are embedded via ``repr`` so
    both engines multiply by the same doubles."""
    cos = (
        _DOT.format(a="c.vec", b="q.qvec") + " / nullif(c.norm * q.qnorm, 0.0)"
    )
    sim = (
        _DOT.format(a="r.vec", b="s.vec") + " / nullif(r.norm * s.norm, 0.0)"
    )
    parts = [
        "n AS (SELECT vec_id, embedding::DOUBLE[] AS vec,"
        f" sqrt({_DOT.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm"
        " FROM embeddings)",
        f"q AS (SELECT vec AS qvec, norm AS qnorm FROM n WHERE vec_id = {query_id})",
        f"""cand AS (
  SELECT vec_id, vec, norm, rel FROM (
    SELECT c.vec_id, c.vec, c.norm, {cos} AS rel,
           row_number() OVER (ORDER BY {cos} DESC, c.vec_id) AS rank
    FROM n c CROSS JOIN q WHERE c.vec_id != {query_id}
  ) WHERE rank <= {shortlist}
)""",
        f"""sel1 AS (
  SELECT 1 AS pick_order, vec_id, vec, norm, rel,
         CAST({lam!r} AS DOUBLE) * rel AS mmr
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
)""",
    ]
    prev = "sel1"
    for step in range(2, k + 1):
        parts.append(
            f"""pick{step} AS (
  SELECT {step} AS pick_order, vec_id, vec, norm, rel, mmr FROM (
    SELECT r.vec_id, r.vec, r.norm, r.rel,
           CAST({lam!r} AS DOUBLE) * r.rel
             - CAST({1.0 - lam!r} AS DOUBLE) * max({sim}) AS mmr
    FROM cand r JOIN {prev} s ON r.vec_id != s.vec_id
    WHERE r.vec_id NOT IN (SELECT vec_id FROM {prev})
    GROUP BY r.vec_id, r.vec, r.norm, r.rel
  ) ORDER BY mmr DESC, vec_id LIMIT 1
)""",
        )
        parts.append(
            f"sel{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{step})"
        )
        prev = f"sel{step}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT pick_order, vec_id, round(rel, 6) AS rel,"
        f" round(mmr, 6) AS mmr FROM {prev}"
    )
