"""Persisted band store (streaming/bandstore.py) — the at-rest answer
to incremental near-dedup's O(store) per-batch banding term.

The load-bearing claims, each pinned here:

* bucket parity — the Python probe-side bucket function and the
  Spark write-side bucket expression agree on every key (a mismatch
  would prune TRUE-match files: silent missed duplicates);
* decision parity — the banded-store sink path emits byte-identical
  decisions to the in-memory kernel, before AND after compaction
  (Bloom pruning has no false negatives, carried signatures verify
  identically);
* compaction folds the delta into a bucketed, Bloom-indexed base and
  the filter cache follows the base generation (a stale cache would
  prune fresh files);
* a signature-store rewrite invalidates the bands and the next batch
  self-rebuilds.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators import dedup as ded
from big_data_engineering_financial_analysis_spark.streaming import corpus
from big_data_engineering_financial_analysis_spark.streaming import bandstore as bst

from tests.conftest import SF_MEDIUM


def _docs(spark):
    return spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")


def _ingest(spark, tmp_path, tag, batches, banded_store=True, bootstrap=True):
    store = str(tmp_path / f"store_{tag}")
    out = str(tmp_path / f"dec_{tag}")
    if bootstrap:
        sigs = ded.minhash_signatures(_docs(spark).filter("doc_id % 2 = 0"))
        os.makedirs(f"{store}/sigs", exist_ok=True)
        sigs.write.mode("overwrite").parquet(f"{store}/sigs")
    sink = corpus.incremental_dedup_sink(
        store, out, threshold=0.5, banded_store=banded_store
    )
    for i, batch in enumerate(batches):
        sink(batch, i)
    dec = {
        r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()
    }
    return dec, store


def test_bucket_function_python_spark_parity(spark):
    keys = [f"k{i}-{i * 37}-x" for i in range(500)] + ["", "0-0-0-0"]
    df = spark.createDataFrame([(k,) for k in keys], "band_key string")
    got = {
        r["band_key"]: r["bb"]
        for r in df.withColumn("bb", bst._bucket_expr()).collect()
    }
    assert got == {k: bst.bucket_of(k) for k in keys}


def test_banded_sink_matches_inmemory_kernel(spark, tmp_path):
    """Same batches, same bootstrap store: the banded-store path and the
    in-memory kernel path must emit identical decisions."""
    odds = _docs(spark).filter("doc_id % 2 = 1")
    median = odds.approxQuantile("doc_id", [0.5], 0.0)[0]
    batches = [
        odds.filter(f"doc_id <= {median}"),
        odds.filter(f"doc_id > {median}"),
    ]
    banded, _ = _ingest(spark, tmp_path, "banded", batches, banded_store=True)
    legacy, _ = _ingest(spark, tmp_path, "legacy", batches, banded_store=False)
    assert banded == legacy
    assert any(v == 1 for v in banded.values()), "fixture has near-dups"


def test_compaction_preserves_decisions_and_caches_by_generation(
    spark, tmp_path, monkeypatch
):
    """Force compaction after the first batch: the second batch's
    decisions must be identical to the uncompacted run, the base must
    be bucketed+indexed, and the filter cache keyed to the new base
    generation."""
    monkeypatch.setattr(bst, "MIN_COMPACT_ROWS", 0)
    monkeypatch.setattr(bst, "COMPACT_FRAC", 0.0)
    odds = _docs(spark).filter("doc_id % 2 = 1")
    median = odds.approxQuantile("doc_id", [0.5], 0.0)[0]
    batches = [
        odds.filter(f"doc_id <= {median}"),
        odds.filter(f"doc_id > {median}"),
    ]
    compacted, store = _ingest(spark, tmp_path, "compact", batches)
    plain, _ = _ingest(spark, tmp_path, "plain", batches, banded_store=False)
    assert compacted == plain
    bs = bst.BandStore(store)
    meta = bs.meta()
    assert meta is not None and meta["base_rows"] > 0
    assert meta["delta_rows"] == 0  # trigger fired on every batch
    leaves = bs._base_leaves()
    assert leaves and all(leaf.startswith("bb=") for leaf in leaves)
    # filters decoded and sealed to the live base generation
    filters = bs._filters()
    assert any(filters.get(leaf) for leaf in leaves)
    cached_fp = bst._FILTER_CACHE[bs.root][0]
    assert cached_fp is not None


def test_bloom_prune_skips_nonmatching_base_files(spark, tmp_path, monkeypatch):
    """A batch whose band keys match nothing in the base must open zero
    base files; a batch containing a true near-dup must open at least
    its partner's file (no-false-negative)."""
    monkeypatch.setattr(bst, "MIN_COMPACT_ROWS", 0)
    monkeypatch.setattr(bst, "COMPACT_FRAC", 0.0)
    rows = [
        (i, "alpha " + " ".join(f"tok{i * 31 + j * 7}" for j in range(40)))
        for i in range(200)
    ]
    store_docs = spark.createDataFrame(rows, "doc_id long, text string")
    dec, store = _ingest(
        spark, tmp_path, "prune", [store_docs], bootstrap=False
    )
    bs = bst.BandStore(store)
    assert (bs.meta() or {}).get("base_rows", 0) > 0
    # distinct fresh docs: every band key is absent from the base
    fresh = spark.createDataFrame(
        [
            (10_000 + i, "omega " + " ".join(f"z{i * 13 + j * 11}" for j in range(40)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    fresh_sigs = ded.minhash_signatures(fresh)
    fresh_keys = [
        r[0]
        for r in ded.band_signatures(fresh_sigs, carry_sig=True)
        .select("band_key")
        .distinct()
        .collect()
    ]
    assert bs._surviving_base_files(fresh_keys) == []
    # a near-copy of store doc 7 must keep at least one file, and the
    # sink must still flag it (end-to-end no-false-negative)
    dup = spark.createDataFrame(
        [(10_100, rows[7][1] + " tail")], "doc_id long, text string"
    )
    dup_keys = [
        r[0]
        for r in ded.band_signatures(ded.minhash_signatures(dup), carry_sig=True)
        .select("band_key")
        .distinct()
        .collect()
    ]
    assert bs._surviving_base_files(dup_keys)
    sink = corpus.incremental_dedup_sink(
        store, str(tmp_path / "dec_prune2"), threshold=0.5
    )
    sink(dup, 1)
    got = {
        r["doc_id"]: r["is_dup"]
        for r in spark.read.parquet(str(tmp_path / "dec_prune2")).collect()
    }
    assert got == {10_100: 1}


def test_signature_compaction_invalidates_and_sink_rebuilds(spark, tmp_path):
    """compact_signature_store rewrites sigs/ -> the band store must go
    invalid, and the NEXT batch rebuilds it from the compacted
    signatures and still blocks against pre-compaction history."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    store = str(tmp_path / "store_inv")
    out = str(tmp_path / "dec_inv")
    sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
    sink(
        spark.createDataFrame([(1, base), (1, base)], "doc_id long, text string")
        .distinct(),
        0,
    )
    bs = bst.BandStore(store)
    assert bs.meta() is not None
    corpus.compact_signature_store(spark, store)
    assert bs.meta() is None  # invalidated with the rewrite
    sink(
        spark.createDataFrame(
            [(9, base + " extra")], "doc_id long, text string"
        ),
        1,
    )
    assert bs.meta() is not None  # rebuilt by the batch
    got = {
        r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()
    }
    assert got[9] == 1  # still deduped against pre-compaction history


def test_crashed_band_compaction_recovers(spark, tmp_path):
    """Aside/stage leftovers from a crashed band compaction heal on the
    next BandStore construction — never a silently-empty base."""
    rows = [(i, f"text alpha {' '.join(str(i * 31 + j) for j in range(30))}")
            for i in range(50)]
    dec, store = _ingest(
        spark, tmp_path, "crash",
        [spark.createDataFrame(rows, "doc_id long, text string")],
        bootstrap=False,
    )
    bs = bst.BandStore(store)
    bs.compact(spark)
    n_leaves = len(bs._base_leaves())
    assert n_leaves > 0
    # simulate crash-between-renames: base moved aside, stage gone
    os.rename(bs.base, bs.base + "._pre_compact")
    bs2 = bst.BandStore(store)  # construction heals
    assert len(bs2._base_leaves()) == n_leaves


import pytest


@pytest.mark.parametrize("banded", [True, False])
def test_replayed_batch_after_partial_commit_does_not_self_match(
    spark, tmp_path, banded
):
    """Crash window: appends succeeded but the batch marker was never
    written.  The replay sees the batch's OWN rows in the store; the
    kernel's pid != bid guard must keep the replayed decisions
    identical to the first attempt's (without it every replayed doc
    self-matches at est_jaccard 1.0 and the batch flips to is_dup=1)."""
    import shutil

    rows = [
        (1, "alpha " + " ".join(f"tok{31 + j * 7}" for j in range(40))),
        (2, "omega " + " ".join(f"z{13 + j * 11}" for j in range(40))),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / f"store_replay_{banded}")
    out = str(tmp_path / f"dec_replay_{banded}")
    sink = corpus.incremental_dedup_sink(
        store, out, threshold=0.5, banded_store=banded
    )
    sink(batch, 0)
    shutil.rmtree(os.path.join(store, "_batches"))  # crash-before-marker
    sink(batch, 0)  # replay: store already holds this batch's rows
    rows_out = spark.read.parquet(out).collect()
    assert len(rows_out) == 4  # both attempts appended
    worst = {}
    for r in rows_out:
        worst[r["doc_id"]] = max(worst.get(r["doc_id"], 0), r["is_dup"])
    assert worst == {1: 0, 2: 0}


def test_legacy_path_interleave_invalidates_bands(spark, tmp_path):
    """banded -> legacy -> banded: the legacy batch appends signatures
    without bands, so it must invalidate the band store; the next
    banded batch rebuilds and still catches a near-dup of the
    legacy-era document."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    store = str(tmp_path / "store_mix")
    out = str(tmp_path / "dec_mix")
    banded = corpus.incremental_dedup_sink(store, out, threshold=0.5)
    legacy = corpus.incremental_dedup_sink(
        store, out, threshold=0.5, banded_store=False
    )
    banded(
        spark.createDataFrame(
            [(1, "omega " + " ".join(f"z{j * 11}" for j in range(40)))],
            "doc_id long, text string",
        ),
        0,
    )
    assert bst.BandStore(store).meta() is not None
    legacy(
        spark.createDataFrame([(5, base)], "doc_id long, text string"), 1
    )
    assert bst.BandStore(store).meta() is None  # invalidated
    banded(
        spark.createDataFrame(
            [(9, base + " extra")], "doc_id long, text string"
        ),
        2,
    )
    got = {
        r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()
    }
    assert got[9] == 1  # rebuilt bands cover the legacy-era doc 5


def test_cluster_sink_banded_matches_legacy_labels(spark, tmp_path):
    """The cluster sink's banded pair generation must produce the same
    final (node, component) labeling as the in-memory kernel path."""
    docs = _docs(spark).filter("doc_id % 2 = 1")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    batches = [
        docs.filter(f"doc_id <= {median}"),
        docs.filter(f"doc_id > {median}"),
    ]

    def run(tag, banded):
        store = str(tmp_path / f"cstore_{tag}")
        sink = corpus.incremental_cluster_sink(
            store, threshold=0.5, banded_store=banded
        )
        for i, b in enumerate(batches):
            sink(b, i)
        return {
            r["node"]: r["component"]
            for r in spark.read.parquet(f"{store}/labels").collect()
        }

    banded = run("banded", True)
    legacy = run("legacy", False)
    assert banded == legacy
    assert len(set(banded.values())) < len(banded), "fixture has clusters"


@pytest.mark.parametrize("banded", [True, False])
def test_replayed_batch_with_inbatch_duplicate_repeats_decisions(
    spark, tmp_path, banded
):
    """The subtler replay case: a batch carrying an in-batch near-dup
    pair.  On replay the store holds BOTH rows' echoes; without the
    batch-id anti-join the larger-id echo would partner the SMALLER id
    through the store side and flip the kept doc to is_dup=1,
    contradicting the first attempt.  Replay must reproduce the first
    attempt's decisions exactly."""
    import shutil

    text = "alpha " + " ".join(f"tok{31 + j * 7}" for j in range(40))
    batch = spark.createDataFrame(
        [(1, text), (7, text + " tail")], "doc_id long, text string"
    )
    store = str(tmp_path / f"store_replay_dup_{banded}")
    out = str(tmp_path / f"dec_replay_dup_{banded}")
    sink = corpus.incremental_dedup_sink(
        store, out, threshold=0.5, banded_store=banded
    )
    sink(batch, 0)
    first = sorted(
        (r["doc_id"], r["is_dup"]) for r in spark.read.parquet(out).collect()
    )
    assert first == [(1, 0), (7, 1)]
    shutil.rmtree(os.path.join(store, "_batches"))  # crash-before-marker
    sink(batch, 0)  # replay against its own echoes
    rows = sorted(
        (r["doc_id"], r["is_dup"]) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, 0), (1, 0), (7, 1), (7, 1)]


def test_cluster_sink_legacy_interleave_invalidates_bands(spark, tmp_path):
    """banded -> legacy -> banded on ONE cluster store: the legacy
    batch appends signatures without bands and must invalidate the
    band store, so the next banded batch rebuilds and still pairs a
    near-dup of the legacy-era document into its cluster."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    store = str(tmp_path / "cstore_mix")
    banded = corpus.incremental_cluster_sink(store, threshold=0.5)
    legacy = corpus.incremental_cluster_sink(
        store, threshold=0.5, banded_store=False
    )
    banded(
        spark.createDataFrame(
            [(1, "omega " + " ".join(f"z{j * 11}" for j in range(40)))],
            "doc_id long, text string",
        ),
        0,
    )
    assert bst.BandStore(store).meta() is not None
    legacy(
        spark.createDataFrame([(5, base)], "doc_id long, text string"), 1
    )
    assert bst.BandStore(store).meta() is None
    banded(
        spark.createDataFrame(
            [(9, base + " extra")], "doc_id long, text string"
        ),
        2,
    )
    assert bst.BandStore(store).meta() is not None  # rebuilt
    labels = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{store}/labels").collect()
    }
    assert labels[5] == labels[9]  # clustered across the legacy era
    assert labels[1] not in (labels[5],)
