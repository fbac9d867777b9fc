"""Partition-scoped compaction: only the named partition is rewritten,
its sidecars refresh dirs-bounded, other partitions' bytes and shard
manifests are untouched, crashes heal, and snapshot pins survive."""

from __future__ import annotations

import os

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources import snapshots as sn
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import (
    compact_partition,
    recover_partition_compaction,
)
from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import (
    dataset_sink,
)
from tests.test_dataset_sink import _chunk


def _rot(spark, out, batches=4):
    """Many small streaming appends: the rot compact_partition removes."""
    sink = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"],
        zonemap_cols=["doc_id"], bloom_cols=["doc_id"],
    )
    for b in range(batches):
        sink(_chunk(spark, b * 50, (b + 1) * 50), b)


def _files_in(out, d):
    p = os.path.join(out, d)
    return sorted(f for f in os.listdir(p) if f.endswith(".parquet"))


def test_compacts_only_the_named_partition(spark, tmp_path):
    out = str(tmp_path / "ds")
    _rot(spark, out)
    before_en = _files_in(out, "lang=en")
    before_de = _files_in(out, "lang=de")
    de_manifest = os.path.join(out, "lang=de", zm.MANIFEST_NAME)
    de_mtime = os.path.getmtime(de_manifest)
    assert len(before_en) >= 4  # one small file per batch: the rot
    total = spark.read.parquet(out).count()

    compact_partition(spark, out, "lang=en", sort_cols=["doc_id"])

    after_en = _files_in(out, "lang=en")
    assert len(after_en) == 1 and not set(after_en) & set(before_en)
    assert _files_in(out, "lang=de") == before_de  # untouched bytes
    assert os.path.getmtime(de_manifest) == de_mtime  # untouched shard
    assert spark.read.parquet(out).count() == total
    # both indexes still prune correctly over the rewritten partition
    got = zm.read_pruned(spark, out, "doc_id", lo=150)
    assert got.count() == 50
    hit = bs.read_point(spark, out, "doc_id", [151]).collect()
    assert len(hit) == 1 and hit[0]["lang"] == "en"
    # shard manifests cover exactly the current files
    manifest = zm.load_zonemap(out)
    assert sorted(manifest) == sorted(
        os.path.relpath(f, out) for f in zm._data_files(out)
    )


def test_crash_recovery_both_windows(spark, tmp_path):
    out = str(tmp_path / "ds")
    _rot(spark, out, batches=2)
    total = spark.read.parquet(out).count()
    aside_root = out + "._pre_compact_part"
    # window 1: between the renames (live dir gone, aside holds it)
    os.renames(os.path.join(out, "lang=en"), os.path.join(aside_root, "lang=en"))
    recover_partition_compaction(out)
    assert not os.path.exists(aside_root)
    assert spark.read.parquet(out).count() == total
    # window 2: after the swap (both exist) — aside is superseded
    os.makedirs(os.path.join(aside_root, "lang=en"))
    with open(os.path.join(aside_root, "lang=en", "stale.parquet"), "wb") as fh:
        fh.write(b"superseded")
    recover_partition_compaction(out)
    assert not os.path.exists(aside_root)
    assert spark.read.parquet(out).count() == total


def test_manifest_snapshot_pin_survives_partition_compaction(spark, tmp_path):
    out = str(tmp_path / "ds")
    _rot(spark, out, batches=2)
    v = sn.commit_snapshot(out, mode="manifest", note="pre")
    before = sorted(
        r.doc_id for r in sn.read_snapshot(spark, out, v).collect()
    )
    compact_partition(spark, out, "lang=en", sort_cols=["doc_id"])
    after = sorted(r.doc_id for r in sn.read_snapshot(spark, out, v).collect())
    assert after == before  # replaced files preserved into the pool
    assert spark.read.parquet(out).count() == len(before)


def test_rejects_empty_and_non_leaf_dir_rel(spark, tmp_path):
    """Advice r9: '' would swap the WHOLE dataset through the partition
    path (deleting root markers/manifests/_snapshots with the aside);
    a non-leaf dir over nested partition dirs would rewrite the nested
    keys as data columns, corrupting the directory layout."""
    import pytest

    out = str(tmp_path / "ds")
    _rot(spark, out, batches=2)
    for bad in ("", "/", "//"):
        with pytest.raises(ValueError, match="empty"):
            compact_partition(spark, out, bad, sort_cols=["doc_id"])
    # nested layout: lang=en/b=0 under a manual re-shape
    nested = str(tmp_path / "nested")
    df = spark.read.parquet(out)
    (
        df.withColumn("b", (df.doc_id % 2).cast("int"))
        .write.partitionBy("lang", "b")
        .parquet(nested)
    )
    with pytest.raises(ValueError, match="not a leaf"):
        compact_partition(spark, nested, "lang=en", sort_cols=["doc_id"])
    # the leaf itself still compacts fine
    compact_partition(spark, nested, "lang=en/b=0", sort_cols=["doc_id"])
    assert len(_files_in(nested, "lang=en/b=0")) == 1


def test_upsized_bloom_sizing_survives_compaction(spark, tmp_path):
    """Advice r9: the pre-swap (m, k) capture must thread into the
    dirs-bounded bloom refresh — the shard manifest leaves with the
    aside, so without the seed the rebuilt filters reset to DEFAULTS."""
    import json

    out = str(tmp_path / "ds")
    _rot(spark, out)
    # simulate a deliberate admin upsize of lang=en's doc_id filters:
    # rebuild the leaf shard manifest at 4x bits (what an upsize op writes)
    leaf = os.path.join(out, "lang=en")
    big_m = bs.DEFAULT_N_BITS * 4
    pairs = [
        (os.path.relpath(f, out), f) for f in bs._data_files(leaf)
    ]
    scanned = bs._scan_blooms(pairs, {"doc_id": (big_m, bs.DEFAULT_N_HASHES)}, None)
    shard = {
        os.path.basename(rel): blooms for rel, (blooms, _names) in scanned.items()
    }
    bs._atomic_json(
        os.path.join(leaf, bs.MANIFEST_NAME),
        {"format": bs.KEY_FORMAT, "files": shard},
    )
    before = bs._shard_files(out, "lang=en", format_gated=True)
    assert all(b["doc_id"]["m"] == big_m for b in before.values())

    compact_partition(spark, out, "lang=en", sort_cols=["doc_id"])

    after = bs._shard_files(out, "lang=en", format_gated=True)
    assert after, "rewritten partition must be re-indexed"
    assert all(
        b["doc_id"]["m"] == big_m for b in after.values()
    ), {rel: b["doc_id"]["m"] for rel, b in after.items()}
    # and the filters still hit
    hit = bs.read_point(spark, out, "doc_id", [151]).collect()
    assert len(hit) == 1 and hit[0]["lang"] == "en"


def test_rejects_dot_and_escaping_dir_rel(spark, tmp_path):
    """r10 review: '.', './x' normalization and '..' escapes must hit
    the guards, not reach the swap protocol."""
    import pytest

    out = str(tmp_path / "ds")
    _rot(spark, out, batches=2)
    for bad in (".", "./", "lang=en/.."):
        with pytest.raises(ValueError, match="empty"):
            compact_partition(spark, out, bad, sort_cols=["doc_id"])
    for bad in ("../other", "..", "/abs/path"):
        with pytest.raises(ValueError):
            compact_partition(spark, out, bad, sort_cols=["doc_id"])
    # normalized-but-valid forms still work
    compact_partition(spark, out, "lang=en/", sort_cols=["doc_id"])
    assert len(_files_in(out, "lang=en")) == 1


def test_compaction_interleaves_with_live_streaming_sink(spark, tmp_path):
    """Verdict r10 ask #7: the documented operational contract — "pause
    the partition's sink for the swap instant" — driven end-to-end with
    a REAL foreachBatch query.  Phase 1: a streaming query commits
    batches into the dataset.  Pause (stop the query at a batch
    boundary).  Compact the hot partition.  Phase 2: the SAME
    checkpoint restarts the query over a source holding both the old
    and new chunks — the old batches must be replay-skipped (root
    markers untouched by the compaction), the new batch must append,
    and both skip indexes must cover and prune the mixed
    compacted+fresh file set."""
    from tests.test_dataset_sink import SCHEMA

    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    ck = str(tmp_path / "ck")

    def start_query():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(
                dataset_sink(
                    out,
                    partition_cols=["lang"],
                    sort_cols=["doc_id"],
                    zonemap_cols=["doc_id"],
                    bloom_cols=["doc_id"],
                )
            )
            .option("checkpointLocation", ck)
            .start()
        )

    # phase 1: three micro-batches land (rot: one small file per batch)
    for lo, hi in [(0, 80), (80, 160), (160, 240)]:
        _chunk(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    q = start_query()
    q.processAllAvailable()
    q.stop()  # <- the pause the contract requires for the swap instant
    assert spark.read.parquet(out).count() == 240
    rot = _files_in(out, "lang=en")
    assert len(rot) >= 3
    markers_before = sorted(os.listdir(os.path.join(out, "_batches")))

    compact_partition(spark, out, "lang=en", sort_cols=["doc_id"])

    # replay markers live at the root: the partition swap left them
    assert sorted(os.listdir(os.path.join(out, "_batches"))) == markers_before
    assert len(_files_in(out, "lang=en")) == 1
    assert spark.read.parquet(out).count() == 240

    # phase 2: new source chunk arrives; restart on the SAME checkpoint
    _chunk(spark, 240, 320).coalesce(1).write.mode("append").parquet(src)
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()

    # exactly-once across the compaction: 4 batches, no re-appends
    full = spark.read.parquet(out)
    assert full.count() == 320
    assert sorted(r.doc_id for r in full.collect()) == list(range(320))
    # the compacted file survived; the new batch added fresh files
    en_after = _files_in(out, "lang=en")
    assert len(en_after) >= 2 and len(en_after) <= 3

    # both sidecars cover the mixed compacted+fresh set and still prune
    manifest = zm.load_zonemap(out)
    assert sorted(manifest) == sorted(
        os.path.relpath(f, out) for f in zm._data_files(out)
    )
    got = zm.read_pruned(spark, out, "doc_id", lo=300)
    assert sorted(r.doc_id for r in got.collect()) == list(range(300, 320))
    keep, total = zm.prune_files(out, "doc_id", lo=300)
    assert 0 < len(keep) < total
    hit = bs.read_point(spark, out, "doc_id", [301]).collect()
    assert len(hit) == 1 and hit[0]["lang"] == "en"
    keep_b, total_b = bs.prune_files_eq(out, "doc_id", [301])
    assert 0 < len(keep_b) < total_b
