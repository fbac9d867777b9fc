"""Round-7 retirements: each retired registry row's semantics stay
covered here (the round-6 precedent: sma_5/ema_10/rsi_10/api_lowest).

Retired (registry capacity, retire-to-grow for the 3 skip-and-serve
rows): rolling_corr, lsh_bucket_histogram, bpe_packing, corpus_funnel,
dedup_spans.  The operator code all stays; only the registry rows went.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_rolling_corr_is_pair_slice_of_matrix(spark):
    """rolling_corr(7, 42) == the (42, 7) slice of rolling_corr_pairs
    with x/y mirrored (the matrix orders pairs lexicographically) —
    bucket-for-bucket, bit-for-bit.  The single-pair row is therefore a
    strict slice of the still-registered matrix query."""
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    single = QUERIES_RETIRED["rolling_corr"](spark, SF).toPandas()
    pairs = QUERIES["rolling_corr_pairs"](spark, SF).toPandas()
    sl = (
        pairs[(pairs.sym_x == "42") & (pairs.sym_y == "7")]
        .sort_values("bucket").reset_index(drop=True)
    )
    a = single.sort_values("bucket").reset_index(drop=True)
    assert len(a) == len(sl) > 0
    assert a["x"].tolist() == sl["y"].tolist()
    assert a["y"].tolist() == sl["x"].tolist()
    ca, cb = a["corr"].tolist(), sl["corr"].tolist()
    assert all(
        (x != x and y != y) or x == y for x, y in zip(ca, cb)  # NaN-safe
    )


def test_lsh_bucket_histogram_consistent_with_bucket_stage(spark):
    """The histogram is a count-projection of the SAME sign-LSH bucket
    stage ann_lsh / dedup_embedding prove end-to-end: totals must equal
    the corpus size and every bucket recount must match."""
    from big_data_engineering_financial_analysis_spark.operators.similarity import lsh_bucket
    from big_data_engineering_financial_analysis_spark.functions.hashing import hyperplanes
    from big_data_engineering_financial_analysis_spark.plans.registry_datapipe import (
        EMB_DIM,
        N_PLANES,
    )

    hist = {
        r["bucket"]: r["n"]
        for r in QUERIES_RETIRED["lsh_bucket_histogram"](spark, SF).collect()
    }
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planes = hyperplanes(N_PLANES, EMB_DIM)
    direct = (
        emb.select(
            lsh_bucket(F.col("embedding").cast("array<double>"), planes).alias("b")
        )
        .groupBy("b").count().collect()
    )
    assert {r["b"]: r["count"] for r in direct} == hist
    assert sum(hist.values()) == emb.count()


def test_bpe_packing_is_tokenize_then_pack(spark):
    """bpe_packing == pack_chunks over size(bpe_pieces(text)) — the
    composition of the still-registered bpe_tokenize kernel and
    seq_packing operator, chunk-for-chunk."""
    from big_data_engineering_financial_analysis_spark.operators.bpe import bpe_pieces
    from big_data_engineering_financial_analysis_spark.operators.packing import pack_chunks

    got = QUERIES_RETIRED["bpe_packing"](spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "bpe_n", F.size(bpe_pieces(F.col("text"))).cast("long")
    )
    want = pack_chunks(docs, n_tokens_col="bpe_n").toPandas()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    a = got[cols].astype(str).sort_values(cols).values.tolist()
    b = want[cols].astype(str).sort_values(cols).values.tolist()
    assert a == b and len(a) > 0


def test_corpus_funnel_counts_match_prep_gates(spark):
    """The funnel report is per-stage survivor counts of corpus_prep's
    own gate chain: the total row is the corpus size, every stage is
    monotone non-increasing in chain order, and the final near-dedup
    stage equals the still-registered corpus_prep query's row count."""
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    funnel = {
        r["stage"]: r["n"]
        for r in QUERIES_RETIRED["corpus_funnel"](spark, SF).collect()
    }
    order = [
        "total", "scrub", "lang", "quality", "repetition",
        "exact_dedup", "near_dedup",
    ]
    assert sorted(funnel) == sorted(order)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert funnel["total"] == docs.count()
    counts = [funnel[s] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert funnel["near_dedup"] == QUERIES["corpus_prep"](spark, SF).count()


def test_dedup_spans_detection_consistent_with_removal(spark):
    """The detection half (repeated_span_stats) must agree with the
    still-registered removal forms: every document that LOSES words in
    span_removal reports duplicated spans, and a document reporting zero
    duplicated spans loses nothing."""
    from big_data_engineering_financial_analysis_spark.operators import dedup
    from big_data_engineering_financial_analysis_spark.plans.registry_datapipe import (
        DEDUP_SPAN_N,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = {
        r["doc_id"]: r["n_dup_spans"]
        for r in dedup.repeated_span_stats(docs, span_n=DEDUP_SPAN_N).collect()
    }
    removal = {
        r["doc_id"]: r["n_words"] - r["n_kept_words"]
        for r in dedup.span_removal(docs, span_n=DEDUP_SPAN_N).collect()
    }
    lost = {d for d, w in removal.items() if w > 0}
    assert lost, "fixture has duplicated spans"
    assert all(stats.get(d, 0) > 0 for d in lost)
    clean = {d for d, n in stats.items() if n == 0}
    assert all(removal.get(d, 0) == 0 for d in clean)


# the retired callables stay importable for these tests (and any user who
# wants the composed forms); they are simply no longer registry rows
def _retired():
    from big_data_engineering_financial_analysis_spark.plans.registry_datapipe import (
        q_bpe_packing,
        q_corpus_funnel,
        q_dedup_spans,
        q_lsh_bucket_histogram,
    )
    from big_data_engineering_financial_analysis_spark.plans.registry_tech import (
        q_rolling_corr,
    )

    return {
        "rolling_corr": q_rolling_corr,
        "lsh_bucket_histogram": q_lsh_bucket_histogram,
        "bpe_packing": q_bpe_packing,
        "corpus_funnel": q_corpus_funnel,
        "dedup_spans": q_dedup_spans,
    }


QUERIES_RETIRED = _retired()


def test_retired_rows_are_unregistered(spark):
    from big_data_engineering_financial_analysis_spark.plans.registry import ORACLES, QUERIES

    for name in QUERIES_RETIRED:
        assert name not in QUERIES and name not in ORACLES
