"""Manifest-mode snapshots (``commit_snapshot(mode="manifest")``) — the
object-store-capable pin: a file LIST instead of hardlinks, resting on
the engine's immutability contract (writers never modify parquet in
place; the compactor moves still-pinned files into the ``_retained``
pool before deleting).  The tests mirror the hardlink suite's
immutability claims where the contract supports them, and prove the
fail-fast where it doesn't (raw out-of-band deletion)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import snapshots as sn
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


def test_manifest_commit_writes_no_data_bytes(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v = sn.commit_snapshot(path, note="cut", mode="manifest")
    vdir = os.path.join(sn._snap_root(path), f"v{v:08d}")
    # no parquet in the version tree: the pin is pure metadata
    assert not any(f.endswith(".parquet") for _r, _d, fs in os.walk(vdir) for f in fs)
    assert sn.snapshot_meta(path, v)["mode"] == "manifest"
    snap = sn.read_snapshot(spark, path, v)
    assert _ids(snap) == list(range(200))
    assert "lang" in snap.columns  # partition encoding preserved
    assert sn.verify_snapshot(path, v) == {
        "mode": "manifest", "n_files": sn.verify_snapshot(path, v)["n_files"],
        "missing": [],
    }


def test_manifest_pin_survives_append(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v1 = sn.commit_snapshot(path, mode="manifest")
    _write(spark, path, 1000, 1050, mode="append")
    assert _ids(sn.read_snapshot(spark, path, v1)) == list(range(200))
    v2 = sn.commit_snapshot(path, mode="manifest")
    assert _ids(sn.read_snapshot(spark, path, v2)) == list(range(200)) + list(
        range(1000, 1050)
    )
    # increments work across manifest versions: added files only
    inc = sn.read_snapshot_increment(spark, path, v1, v2)
    assert _ids(inc) == list(range(1000, 1050))


def test_manifest_pin_survives_compaction_via_retained_pool(spark, tmp_path):
    """Compaction rewrites every file and deletes the old tree; the
    pinned files must move into the retained pool and the pinned read
    must stay byte-identical."""
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v1 = sn.commit_snapshot(path, mode="manifest")
    before = _ids(sn.read_snapshot(spark, path, v1))
    compact_dataset(spark, path, ["lang"], ["score"])
    pool = os.path.join(sn._snap_root(path), sn._RETAINED)
    assert os.path.isdir(pool)  # the old files were preserved, not lost
    assert sn.verify_snapshot(path, v1)["missing"] == []
    after = _ids(sn.read_snapshot(spark, path, v1))
    assert after == before
    # live reads see the compacted layout, snapshot reads the pinned one
    assert _ids(spark.read.parquet(path)) == before


def test_manifest_raw_deletion_fails_fast_not_silently_wrong(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 120)
    v1 = sn.commit_snapshot(path, mode="manifest")
    # delete the live tree OUTSIDE the engine's mutators: the contract
    # the pin rests on is broken, and the read must say so
    shutil.rmtree(os.path.join(path, "lang=1"))
    rep = sn.verify_snapshot(path, v1)
    assert rep["missing"] and all("lang=1" in m for m in rep["missing"])
    with pytest.raises(ValueError, match="immutability contract"):
        sn.read_snapshot(spark, path, v1).collect()


def test_expire_garbage_collects_retained_pool(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v1 = sn.commit_snapshot(path, mode="manifest")
    compact_dataset(spark, path, ["lang"], ["score"])
    pool = os.path.join(sn._snap_root(path), sn._RETAINED)
    retained = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(pool)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert retained  # compaction parked the pinned files here
    v2 = sn.commit_snapshot(path, mode="manifest")
    dropped = sn.expire_snapshots(path, keep_last=1)
    assert dropped == [v1]
    # nothing pins the pre-compaction files any more: pool is emptied
    left = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(pool)
        for f in fs
        if f.endswith(".parquet")
    ] if os.path.isdir(pool) else []
    assert left == []
    assert _ids(sn.read_snapshot(spark, path, v2)) == list(range(200))


def test_expire_keeps_pool_files_still_pinned_by_remaining_versions(
    spark, tmp_path
):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    v1 = sn.commit_snapshot(path, mode="manifest")
    v2 = sn.commit_snapshot(path, mode="manifest")  # same file set
    compact_dataset(spark, path, ["lang"], ["score"])
    sn.expire_snapshots(path, keep_last=1)  # drops v1, keeps v2
    assert sn.verify_snapshot(path, v2)["missing"] == []
    assert _ids(sn.read_snapshot(spark, path, v2)) == list(range(100))


def test_modes_mix_and_diff_across_modes(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path, 0, 100)
    v1 = sn.commit_snapshot(path, mode="link")
    _write(spark, path, 1000, 1020, mode="append")
    v2 = sn.commit_snapshot(path, mode="manifest")
    diff = sn.snapshot_file_diff(path, v1, v2)
    assert diff["removed"] == [] and len(diff["added"]) > 0
    assert _ids(sn.read_snapshot_increment(spark, path, v1, v2)) == list(
        range(1000, 1020)
    )
    with pytest.raises(ValueError):
        sn.commit_snapshot(path, mode="nope")


def test_recovery_preserves_pinned_files_from_aside_tree(spark, tmp_path):
    """Crash in compact_dataset's post-swap window, BEFORE
    preserve_replaced_tree ran: the aside copy holds the only bytes of
    manifest-pinned files, and recovery is about to delete it.
    recover_compaction must run the preserve step first — otherwise the
    pin is permanently broken (the round-8 review finding)."""
    import big_data_engineering_financial_analysis_spark.sources.dataset as ds

    path = str(tmp_path / "ds")
    _write(spark, path, 0, 200)
    v1 = sn.commit_snapshot(path, mode="manifest")
    before = _ids(sn.read_snapshot(spark, path, v1))

    # simulate the crash window: the swap happened (new live tree, aside
    # holds the ONLY copies of the pinned pre-compaction files), but
    # preserve_replaced_tree never ran
    aside = path + "._pre_compact"
    os.rename(path, aside)
    _write(spark, path, 200, 260)  # the "compacted" replacement tree
    assert sn.verify_snapshot(path, v1)["missing"]  # pins point nowhere live

    ds.recover_compaction(path)
    assert not os.path.exists(aside)  # recovery completed the deletion
    assert sn.verify_snapshot(path, v1)["missing"] == []
    assert _ids(sn.read_snapshot(spark, path, v1)) == before
    # live tree is the post-swap one, untouched by recovery
    assert _ids(spark.read.parquet(path)) == list(range(200, 260))
