"""Corpus-release end-to-end: the whole training-data pipeline composed.

One test drives the full path a production corpus build takes through
this engine — every stage is an operator proven elsewhere in isolation;
this proves they COMPOSE:

  micro-batched ingest      dataset_sink (zone map + bloom sidecar +
      |                      snapshot cadence)
  snapshot cut v1           consistent, immutable "corpus as of cut 1"
      |
  more ingest -> cut v2
      |
  read_snapshot_increment   exactly the new rows, added-files scan only
      |
  incremental near-dedup    vs the persisted signature store
      |
  PII redaction + quality   row-local gates on the surviving increment
      |
  point-lookup serving      bloom-pruned doc_id fetch on the release cut
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators import text as tx
from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources import snapshots as sn
from big_data_engineering_financial_analysis_spark.streaming import corpus as sc
from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import dataset_sink
from tests.conftest import SF_MEDIUM


def test_corpus_release_pipeline(spark, tmp_path):
    store = str(tmp_path / "corpus")
    sig_store = str(tmp_path / "sigstore")
    decisions = str(tmp_path / "decisions")

    docs = (
        spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
        .select("doc_id", "lang", "text")
        .orderBy("doc_id")
    )
    batch1 = docs.limit(120)
    # batch 2: 60 genuinely new docs + 10 byte-identical dupes of batch 1
    fresh = docs.filter("doc_id >= 120").limit(60)
    dupes = batch1.limit(10).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "lang", "text"
    )
    batch2 = fresh.unionByName(dupes)

    # --- ingest: indexed, snapshot-every-batch sink -----------------------
    sink = dataset_sink(
        store, partition_cols=["lang"], sort_cols=["doc_id"],
        zonemap_cols=["doc_id"], bloom_cols=["doc_id"], snapshot_every=1,
    )
    sink(batch1, 0)
    sink(batch2, 1)
    v1, v2 = sn.snapshot_versions(store)

    # cuts are consistent and immutable
    assert sn.read_snapshot(spark, store, v1).count() == 120
    assert sn.read_snapshot(spark, store, v2).count() == 190

    # --- increment: exactly the rows added between the cuts --------------
    inc = sn.read_snapshot_increment(spark, store, v1, v2)
    assert inc.count() == 70
    assert set(r.doc_id for r in inc.select("doc_id").collect()) == set(
        r.doc_id for r in batch2.select("doc_id").collect()
    )

    # --- incremental near-dedup of the increment vs batch-1 history ------
    os.makedirs(sig_store, exist_ok=True)
    dedup_sink = sc.incremental_dedup_sink(sig_store, decisions, threshold=0.9)
    dedup_sink(batch1.select("doc_id", "text"), 0)
    dedup_sink(inc.select("doc_id", "text"), 1)
    verdicts = {
        r.doc_id: r.is_dup for r in spark.read.parquet(decisions).collect()
    }
    dup_ids = {r.doc_id for r in dupes.select("doc_id").collect()}
    assert all(verdicts[d] == 1 for d in dup_ids)  # every dupe caught
    inc_ids = {r.doc_id for r in inc.select("doc_id").collect()}
    survivors = inc.join(
        spark.createDataFrame(
            [(d,) for d, v in verdicts.items() if v == 0], ["doc_id"]
        ),
        "doc_id",
    )
    # decisions cover BOTH batches; survivors are the increment's keepers
    assert survivors.count() == sum(1 for d in inc_ids if verdicts[d] == 0) > 0

    # --- privacy + quality gates on the surviving increment --------------
    released = (
        tx.with_pii_redaction(survivors)
        .filter(F.col("pii_ok") == 1)
        .select("doc_id", F.col("text_redacted").alias("text"))
    )
    released = tx.with_token_stats(released).filter(F.col("n_tokens") > 0)
    n_released = released.count()
    assert 0 < n_released <= 60

    # --- serving on the release cut: bloom-pruned point lookup -----------
    vdir = os.path.join(sn._snap_root(store), f"v{v2:08d}")
    some_id = released.select("doc_id").first().doc_id
    keep, total = bs.prune_files_eq(vdir, "doc_id", [some_id])
    assert len(keep) < total  # the sidecar travelled with the cut and prunes
    got = bs.read_point(spark, vdir, "doc_id", [some_id])
    assert got.count() == 1
