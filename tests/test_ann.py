"""ANN quality: recall of the approximate paths against the exact
brute-force baseline, and the Lloyd-refit coarse quantizer."""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.operators import similarity

QUERY_IDS = list(range(20))
K = 10


def _topk_sets(df):
    pdf = df.toPandas()
    return {
        q: set(g.sort_values("rank")["neighbor_id"].head(K))
        for q, g in pdf.groupby("query_id")
    }


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
    return hits / sum(len(exact[q]) for q in exact)


@pytest.fixture(scope="module")
def exact_topk(spark, sf_medium_embeddings):
    out = _topk_sets(similarity.cosine_topk(sf_medium_embeddings, QUERY_IDS, k=K))
    spark.catalog.clearCache()
    return out


def test_ivf_recall_fixed_centroids(spark, sf_medium_embeddings, exact_topk):
    """0.8 floor at the 8/16 default probes on BALANCED cells.  The old
    0.9@4-probes bar was an artifact: unscaled centroids piled 82% of
    the corpus into one cell, so probing it scanned nearly everything
    (r9 shell-scale fix in ivf_centroids).  These synthetic embeddings
    are largely unstructured, so recall ~ probed mass (measured 0.86 at
    8/16); clustered real data recovers recall at smaller fractions."""
    got = _topk_sets(similarity.ivf_ann_topk(sf_medium_embeddings, QUERY_IDS, k=K))
    spark.catalog.clearCache()
    assert _recall(got, exact_topk) >= 0.8


def test_ivf_refit_improves_or_matches_recall(spark, sf_medium_embeddings, exact_topk):
    """Trained centroids must not lose recall vs the fixed md5 seeds, and
    training must actually move them (the corpus is not centered on the
    deterministic seeds)."""
    from big_data_engineering_financial_analysis_spark.functions.hashing import ivf_centroids

    fixed = ivf_centroids(similarity.DEFAULT_IVF_CELLS, 64)
    trained = similarity.ivf_refit_centroids(sf_medium_embeddings, iters=2)
    assert trained != fixed
    got_fixed = _topk_sets(similarity.ivf_ann_topk(sf_medium_embeddings, QUERY_IDS, k=K))
    spark.catalog.clearCache()
    got_trained = _topk_sets(
        similarity.ivf_ann_topk(sf_medium_embeddings, QUERY_IDS, k=K, centroids=trained)
    )
    spark.catalog.clearCache()
    assert _recall(got_trained, exact_topk) >= _recall(got_fixed, exact_topk) - 0.02


def test_ivf_refit_sampled_is_deterministic(spark, sf_medium_embeddings):
    a = similarity.ivf_refit_centroids(sf_medium_embeddings, iters=1, sample_fraction=0.5)
    b = similarity.ivf_refit_centroids(sf_medium_embeddings, iters=1, sample_fraction=0.5)
    assert a == b


def test_pandas_topk_agrees_with_fold_baseline(spark, sf_medium_embeddings, exact_topk):
    """The Arrow/numpy variant returns the same neighbors as the JVM-fold
    baseline (allowing last-ulp rank swaps at ties: recall >= 0.95)."""
    got = _topk_sets(
        similarity.cosine_topk_pandas(sf_medium_embeddings, QUERY_IDS, k=K)
    )
    spark.catalog.clearCache()
    assert _recall(got, exact_topk) >= 0.95


def test_embedding_dedup_bucket_cap_bounds_hot_bucket(spark):
    """Identical vectors all collide in every sign-LSH table; bucket_cap
    keeps the smallest ids and bounds the candidate clique."""
    import random

    rng = random.Random(7)
    dup = [1.0] + [0.0] * 15
    rows = [(i, dup) for i in range(10)]
    rows += [(100 + i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.embedding_dedup_pairs_lsh(
        df, threshold=0.99, dim=16, bucket_cap=3
    )
    pairs = {(r.id_a, r.id_b) for r in capped.filter("id_a < 100 AND id_b < 100").collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}
    uncapped = similarity.embedding_dedup_pairs_lsh(df, threshold=0.99, dim=16, bucket_cap=None)
    assert uncapped.filter("id_a < 100 AND id_b < 100").count() == 10 * 9 // 2
    spark.catalog.clearCache()


def test_pq_rerank_recall(spark, sf_medium_embeddings, exact_topk):
    """ADC shortlist + exact re-rank recovers most true neighbors even on
    this near-random corpus (consecutive top-10 cosine gaps ~0.01, well
    below PQ quantization error — raw ADC recall is ~0.18 by nature).
    Random 100-of-2000 shortlisting would give recall ~0.05."""
    from big_data_engineering_financial_analysis_spark.operators import pq

    got = _topk_sets(pq.pq_rerank_topk(sf_medium_embeddings, QUERY_IDS, k=K))
    spark.catalog.clearCache()
    assert _recall(got, exact_topk) >= 0.6


def test_pq_rerank_wider_shortlist_converges_to_exact(spark, sf_medium_embeddings, exact_topk):
    from big_data_engineering_financial_analysis_spark.operators import pq

    got = _topk_sets(
        pq.pq_rerank_topk(sf_medium_embeddings, QUERY_IDS, k=K, shortlist=300)
    )
    spark.catalog.clearCache()
    assert _recall(got, exact_topk) >= 0.9


def test_pq_trained_codebooks_do_not_lose_recall(spark, sf_medium_embeddings, exact_topk):
    """Per-subspace Lloyd refit must match-or-beat the fixed md5 books
    (same contract as the IVF coarse-quantizer refit test)."""
    from big_data_engineering_financial_analysis_spark.operators import pq

    fixed = _recall(
        _topk_sets(pq.pq_rerank_topk(sf_medium_embeddings, QUERY_IDS, k=K)), exact_topk
    )
    spark.catalog.clearCache()
    cb = pq.pq_refit_codebooks(sf_medium_embeddings, iters=3)
    trained = _recall(
        _topk_sets(
            pq.pq_rerank_topk(sf_medium_embeddings, QUERY_IDS, k=K, codebooks=cb)
        ),
        exact_topk,
    )
    spark.catalog.clearCache()
    assert trained >= fixed - 0.02


def test_random_projection_preserves_norms_on_average(spark, sf_medium_embeddings):
    """JL sanity: with the 1/sqrt(out_dim) scaling, projected squared
    norms are an unbiased-ish estimate of the original — the per-vector
    ratio concentrates near 1 (loose bounds: 16 dims is a coarse sketch;
    direction components are uniform, not gaussian, so only approximate
    isometry is expected)."""
    from pyspark.sql import functions as F

    out = similarity.random_projection(sf_medium_embeddings, out_dim=16)
    ratios = (
        similarity.with_norm(out, "proj", "pnorm")
        .select((F.col("pnorm") ** 2).alias("p2"))
        .agg(F.avg("p2").alias("m"))
        .collect()[0]["m"]
    )
    # original embeddings are ~unit-norm, direction var = 1/3 -> E[p2] ~ 1/3
    assert 0.15 < ratios < 0.7
    spark.catalog.clearCache()


# --- semantic dedup (SemDeDup, Abbas et al. 2023) ------------------------


def test_semantic_dedup_drops_within_cell_near_dup(spark):
    from big_data_engineering_financial_analysis_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.01]),     # cell 1
        (2, [0.99, 0.011]),   # cell 1, cosine ~1 with id 1 -> dropped
        (3, [0.01, 1.0]),     # cell 2, alone -> kept
        (4, [-1.0, 0.05]),    # lands in cell 2 but cos(3,4) ~ 0.04 -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.9, centroids=cents, dim=2
        ).collect()
    }
    assert len(out) == 4                      # one verdict row per vector
    assert out[1]["keep"] == 1                # min-id survivor
    assert out[2]["keep"] == 0                # its near-dup dropped
    assert out[3]["keep"] == 1
    assert out[4]["keep"] == 1                # anti-parallel: cos < 0


def test_semantic_dedup_is_cell_local(spark):
    """Near-dups in DIFFERENT cells are not compared — the documented
    recall/cost trade-off (same contract as every bucketed strategy)."""
    from big_data_engineering_financial_analysis_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [0.70710678, 0.70710678]]
    # cosine(a, b) ~ 0.95 but a sits nearest centroid 1, b nearest centroid 2
    rows = [(1, [1.0, 0.18]), (2, [0.84, 0.54])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.9, centroids=cents, dim=2).collect()}
    assert out[1]["cell"] != out[2]["cell"]
    assert out[1]["keep"] == 1 and out[2]["keep"] == 1


def test_semantic_dedup_hot_cell_split_is_value_identical(spark, sf_medium_embeddings):
    """De-skew plumbing (round-7): forcing EVERY cell through the
    hash-addressed block split must reproduce the unsplit verdicts
    bit-for-bit — the split changes which task generates a pair, never
    whether it is generated."""
    from big_data_engineering_financial_analysis_spark.operators.similarity import semantic_dedup

    emb = sf_medium_embeddings
    key = ["vec_id", "cell", "keep"]
    plain = (
        semantic_dedup(emb, threshold=0.45, dim=64)
        .toPandas().sort_values("vec_id")[key].values.tolist()
    )
    # hot_cell=1 forces the split path for every cell; block=7 makes
    # multiple blocks per cell at sf0.01 (ragged sizes on purpose)
    split = (
        semantic_dedup(emb, threshold=0.45, dim=64, hot_cell=1, block=7)
        .toPandas().sort_values("vec_id")[key].values.tolist()
    )
    assert plain == split


def test_semantic_dedup_composes_with_refit_centroids(spark, sf_medium_embeddings):
    """The production shape: refit the IVF coarse quantizer with Lloyd
    iterations, then semantic-dedup on the trained cells.  Deterministic
    (fixed init + deterministic assignment), and the trained cells must
    yield a valid one-verdict-per-vector report."""
    from big_data_engineering_financial_analysis_spark.operators.similarity import (
        ivf_refit_centroids,
        semantic_dedup,
    )

    emb = sf_medium_embeddings
    cents = ivf_refit_centroids(emb, n_cells=8, iters=1, dim=64)
    out = semantic_dedup(emb, threshold=0.45, centroids=cents, dim=64)
    n = emb.count()
    pdf = out.toPandas()
    assert len(pdf) == n
    assert set(pdf["keep"].unique()) <= {0, 1}
    assert pdf["cell"].between(1, 8).all()
    # determinism: second run bit-identical
    pdf2 = semantic_dedup(emb, threshold=0.45, centroids=cents, dim=64).toPandas()
    key = ["vec_id", "cell", "keep"]
    assert pdf.sort_values("vec_id")[key].values.tolist() == \
        pdf2.sort_values("vec_id")[key].values.tolist()
