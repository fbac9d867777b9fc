"""Snapshot isolation (sources/snapshots.py): a pinned version survives —
byte-for-byte — every later mutation the dataset layer can perform
(append, overwrite, compaction, expiry of other versions), while costing
zero data bytes (hardlinks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources import snapshots as sn
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import (
    compact_dataset,
    write_sharded,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 2).cast("double").alias("score"),
    )


def _write(spark, path, lo=0, hi=300, mode="overwrite"):
    write_sharded(
        _df(spark, lo, hi), path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=40, mode=mode,
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_snapshot_survives_overwrite(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 300)
    v1 = sn.commit_snapshot(path, note="first cut")
    assert v1 == 1
    # Spark's overwrite deletes the whole live tree; the sibling snapshot
    # and its hardlinked inodes must not notice
    _write(spark, path, 1000, 1100)
    assert _ids(spark.read.parquet(path)) == list(range(1000, 1100))
    snap = sn.read_snapshot(spark, path, v1)
    assert _ids(snap) == list(range(300))
    assert "lang" in snap.columns  # partition encoding preserved
    assert sn.snapshot_meta(path, v1)["note"] == "first cut"


def test_snapshot_survives_compaction_and_dataset_deletion(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v1 = sn.commit_snapshot(path)
    before = _ids(sn.read_snapshot(spark, path, v1))
    compact_dataset(spark, path, ["lang"], ["score"])
    assert _ids(sn.read_snapshot(spark, path, v1)) == before == list(range(200))
    # even deleting the live dataset leaves the pinned version readable
    import shutil

    shutil.rmtree(path)
    assert _ids(sn.read_snapshot(spark, path, v1)) == before


def test_versions_accumulate_and_expire(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    v1 = sn.commit_snapshot(path)
    _write(spark, path, 0, 150)
    v2 = sn.commit_snapshot(path)
    _write(spark, path, 0, 250)
    v3 = sn.commit_snapshot(path)
    assert sn.snapshot_versions(path) == [v1, v2, v3]
    assert len(_ids(sn.read_snapshot(spark, path, v2))) == 150
    assert len(_ids(sn.read_snapshot(spark, path))) == 250  # default latest

    assert sn.expire_snapshots(path, keep_last=1) == [v1, v2]
    assert sn.snapshot_versions(path) == [v3]
    with pytest.raises(FileNotFoundError, match="expired"):
        sn.read_snapshot(spark, path, v1)
    assert len(_ids(sn.read_snapshot(spark, path, v3))) == 250


def test_snapshot_costs_no_data_bytes(spark, tmp_path):
    """Hardlink proof: every snapshotted file shares its inode with the
    live file (st_nlink > 1), no byte duplication."""
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    v1 = sn.commit_snapshot(path)
    vdir = os.path.join(sn._snap_root(path), f"v{v1:08d}")
    snapped = [
        os.path.join(root, f)
        for root, _d, files in os.walk(vdir)
        for f in files
        if f.endswith(".parquet")
    ]
    assert snapped
    assert all(os.stat(f).st_nlink >= 2 for f in snapped)


def test_sidecar_indexes_travel_with_snapshot(spark, tmp_path):
    """Zone/bloom pruning works against the snapshot tree exactly as
    against live: the sidecars are copied at commit, and skipping still
    yields result == full scan + filter."""
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 300)
    zm.build_zonemap(path, ["score"])
    bs.build_bloom_index(path, ["doc_id"])
    v1 = sn.commit_snapshot(path)
    _write(spark, path, 1000, 1010)  # live tree replaced

    vdir = os.path.join(sn._snap_root(path), f"v{v1:08d}")
    keep, total = bs.prune_files_eq(vdir, "doc_id", [7])
    assert total > 3 and len(keep) < total  # the copied sidecar prunes
    got = bs.read_point(spark, vdir, "doc_id", [7])
    assert _ids(got) == [7]
    kept, total_z = zm.prune_files(vdir, "score", 0.0, 50.0)
    assert len(kept) < total_z


def test_snapshot_tree_invisible_to_live_scans_and_indexes(spark, tmp_path):
    """The sibling layout keeps snapshots out of the dataset directory;
    and even an in-dataset underscore dir is pruned by _data_files (the
    Spark file-index convention), so index builds never double-count."""
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    n_files_before = len(zm._data_files(path))
    sn.commit_snapshot(path)
    assert len(zm._data_files(path)) == n_files_before
    assert _ids(spark.read.parquet(path)) == list(range(100))
    # underscore-dir pruning inside the dataset itself
    os.makedirs(os.path.join(path, "_stray"))
    import shutil

    src = zm._data_files(path)[0]
    shutil.copy2(src, os.path.join(path, "_stray", "orphan.parquet"))
    assert len(zm._data_files(path)) == n_files_before


def test_compaction_snapshot_before_makes_it_reversible(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 120)
    compact_dataset(spark, path, ["lang"], ["score"], snapshot_before=True)
    versions = sn.snapshot_versions(path)
    assert len(versions) == 1
    assert sn.snapshot_meta(path, versions[0])["note"] == "pre-compaction"
    # the pinned pre-compaction rows equal the post-compaction live rows
    assert _ids(sn.read_snapshot(spark, path, versions[0])) == _ids(
        spark.read.parquet(path)
    )


def test_expiry_edge_cases_and_version_ids_never_reused(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 60)
    v1 = sn.commit_snapshot(path)
    v2 = sn.commit_snapshot(path)
    # keep_last larger than what exists: drop NOTHING (regression: the
    # negative slice used to delete the oldest versions instead)
    assert sn.expire_snapshots(path, keep_last=5) == []
    assert sn.snapshot_versions(path) == [v1, v2]
    # full expiry, then a new commit: the version id advances past the
    # high-water mark — "train on v1" can never resolve to new data
    assert sn.expire_snapshots(path, keep_last=0) == [v1, v2]
    _write(spark, path, 100, 160)
    v3 = sn.commit_snapshot(path)
    assert v3 == v2 + 1
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, path, v1)
    assert _ids(sn.read_snapshot(spark, path, v3)) == list(range(100, 160))


def test_commit_on_empty_dataset_dir(tmp_path):
    """A dataset directory that exists but holds no data files still
    commits a well-formed (empty) version instead of crashing."""
    path = str(tmp_path / "ds")
    import os

    os.makedirs(path)
    v = sn.commit_snapshot(path, note="pre-first-write")
    assert sn.snapshot_versions(path) == [v]
    assert sn.snapshot_meta(path, v)["n_files"] == 0


def test_snapshot_increment_reads_only_new_rows(spark, tmp_path):
    """Between append-only cuts, read_snapshot_increment returns exactly
    the rows added — from the added files only.  A compaction between
    cuts is detected (strict) instead of re-emitting the corpus."""
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    v1 = sn.commit_snapshot(path)
    _write(spark, path, 100, 160, mode="append")
    v2 = sn.commit_snapshot(path)

    diff = sn.snapshot_file_diff(path, v1, v2)
    assert diff["added"] and not diff["removed"]
    inc = sn.read_snapshot_increment(spark, path, v1, v2)
    assert _ids(inc) == list(range(100, 160))
    assert "lang" in inc.columns  # partition encoding recovered
    # empty range is an empty frame with the right schema
    assert sn.read_snapshot_increment(spark, path, v2, v2).count() == 0

    # compaction rewrites every file: strict detects, non-strict consumes
    compact_dataset(spark, path, ["lang"], ["score"])
    v3 = sn.commit_snapshot(path)
    with pytest.raises(ValueError, match="rewrite"):
        sn.read_snapshot_increment(spark, path, v2, v3)
    loose = sn.read_snapshot_increment(spark, path, v2, v3, strict=False)
    assert len(_ids(loose)) == 160  # the rewritten corpus, caller dedups


def test_crash_safety_and_remote_path_rejected(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 50)
    v1 = sn.commit_snapshot(path)
    # a crashed commit leaves only a .tmp dir: invisible to readers,
    # reaped by the next commit, version numbering unaffected
    root = sn._snap_root(path)
    os.makedirs(os.path.join(root, ".tmp-v00000099-dead"))
    assert sn.snapshot_versions(path) == [v1]
    v2 = sn.commit_snapshot(path)
    assert v2 == v1 + 1
    assert not [n for n in os.listdir(root) if n.startswith(".tmp-")]
    with pytest.raises(ValueError, match="driver-local"):
        sn.commit_snapshot("s3://bucket/ds")
