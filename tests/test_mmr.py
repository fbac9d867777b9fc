"""MMR diversified retrieval semantics."""

from __future__ import annotations


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_prefers_diverse_over_redundant(spark):
    """Corpus: query q, three near-copies of the best match, and one
    moderately-relevant but orthogonal doc.  Pure top-3 would take the
    three copies; MMR must slot the orthogonal doc into its top picks."""
    from big_data_engineering_financial_analysis_spark.operators.mmr import mmr_select

    q = [1.0, 0.0, 0.0, 0.0]
    near = [[0.999, 0.01 * k, 0.0, 0.0] for k in range(1, 4)]  # ids 1..3
    ortho = [0.5, 0.0, 0.86, 0.0]                              # id 4
    out = mmr_select(
        _emb(spark, [q] + near + [ortho]), query_id=0, k=3, shortlist=4, lam=0.5
    ).collect()
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["pick_order"])]
    assert picked[0] in (1, 2, 3)      # first pick = pure relevance
    assert 4 in picked, picked          # diversity beats the third copy
    # rel of every pick is a valid cosine; mmr <= lam * rel by construction
    for r in out:
        assert -1.0 - 1e-9 <= r["rel"] <= 1.0 + 1e-9
        assert r["mmr"] <= 0.5 * r["rel"] + 1e-9


def test_mmr_first_pick_is_top_relevance_with_id_tiebreak(spark):
    from big_data_engineering_financial_analysis_spark.operators.mmr import mmr_select

    # two identical candidates: the lower id must win the tie
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.9, 0.1]]
    out = mmr_select(_emb(spark, vecs), query_id=0, k=2, shortlist=2).collect()
    first = next(r for r in out if r["pick_order"] == 1)
    assert first["vec_id"] == 1
