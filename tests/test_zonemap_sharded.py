"""Partition-sharded zone-map manifests — same 1M-file argument as the
Bloom sidecar's sharding: O(1) root marker, one shard per leaf partition
directory, directory-level partition pruning BEFORE any shard is opened.
Invariant held throughout: pruned read == full scan + filter."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded


def _write(spark, path, n=300):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    write_sharded(
        df, path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=40,
    )
    return df


def test_partitioned_build_writes_shards_and_root_marker(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["score"])
    with open(os.path.join(path, zm.MANIFEST_NAME)) as fh:
        root = json.load(fh)
    assert root["sharded"] is True and root["files"] == {}
    assert os.path.getsize(os.path.join(path, zm.MANIFEST_NAME)) < 100
    for lang in ("0", "1", "2"):
        shard_fp = os.path.join(path, f"lang={lang}", zm.MANIFEST_NAME)
        assert os.path.isfile(shard_fp)
    # merged view unchanged: rel-keyed, every file covered
    full = zm.load_zonemap(path)
    assert set(full) == {
        os.path.relpath(f, path) for f in zm._data_files(path)
    }


def test_flat_dataset_keeps_legacy_single_manifest(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(100).selectExpr("id", "id * 2.0 AS score").repartition(
        4
    ).write.parquet(path)
    zm.build_zonemap(path, ["score"])
    with open(os.path.join(path, zm.MANIFEST_NAME)) as fh:
        root = json.load(fh)
    assert "sharded" not in root  # byte-compatible legacy rel-keyed map
    keep, total = zm.prune_files(path, "score", 0.0, 10.0)
    assert 0 < len(keep) <= total


def test_partition_range_prunes_without_opening_other_shards(
    spark, tmp_path, monkeypatch
):
    """A range on the partition column must never open pruned-away
    partitions' shards (garbage there proves it) and must still equal
    full scan + filter."""
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    zm.build_zonemap(path, ["score"])
    for lang in ("1", "2"):
        with open(os.path.join(path, f"lang={lang}", zm.MANIFEST_NAME), "w") as fh:
            fh.write("GARBAGE")

    opened: list[str] = []
    real = zm._shard_zones

    def spy(p, d):
        opened.append(d)
        return real(p, d)

    monkeypatch.setattr(zm, "_shard_zones", spy)
    # lang is a string partition col: equality-as-range ["0", "0"]
    keep, total = zm.prune_files_multi(
        path, [("lang", "0", "0"), ("score", 0.0, 100.0)]
    )
    assert opened == ["lang=0"]
    assert keep and all("lang=0" in f for f in keep) and len(keep) < total
    got = zm.read_pruned_multi(
        spark, path, [("lang", "0", "0"), ("score", 0.0, 100.0)]
    )
    expect = df.filter("lang = '0' AND score BETWEEN 0.0 AND 100.0")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in expect.collect()
    )


def test_sharded_prune_equals_full_scan_on_data_column(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    zm.build_zonemap(path, ["score"])
    got = zm.read_pruned(spark, path, "score", 100.0, 160.0)
    expect = df.filter("score BETWEEN 100.0 AND 160.0")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in expect.collect()
    )
    keep, total = zm.prune_files(path, "score", 100.0, 160.0)
    assert len(keep) < total  # within-partition sort makes zones selective


def test_update_preserves_sharded_layout(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["score"])
    extra = spark.createDataFrame(
        [(9001, "9", 9999.0)], "doc_id long, lang string, score double"
    )
    extra.write.mode("append").partitionBy("lang").parquet(path)
    zm.update_zonemap(path)
    with open(os.path.join(path, zm.MANIFEST_NAME)) as fh:
        assert json.load(fh)["sharded"] is True
    assert os.path.isfile(os.path.join(path, "lang=9", zm.MANIFEST_NAME))
    keep, _total = zm.prune_files(path, "score", 9000.0, None)
    assert any("lang=9" in f for f in keep)
    got = zm.read_pruned(spark, path, "score", 9000.0, None)
    assert [r.doc_id for r in got.collect()] == [9001]


def test_legacy_rel_keyed_manifest_still_loads_and_prunes(spark, tmp_path):
    """A pre-sharding manifest (flat rel-keyed JSON at the root of a
    PARTITIONED dataset) keeps working unchanged — no forced rebuild."""
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    manifest = {
        os.path.relpath(f, path): zm._file_zones(f, ["score"])[0]
        for f in zm._data_files(path)
    }
    zm._atomic_json(os.path.join(path, zm.MANIFEST_NAME), manifest)  # legacy
    assert zm.load_zonemap(path) == manifest
    got = zm.read_pruned(spark, path, "score", 0.0, 100.0)
    expect = df.filter("score BETWEEN 0.0 AND 100.0")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in expect.collect()
    )


def test_walk_prunes_failing_partition_directories(spark, tmp_path):
    """Since round 8 a partition directory that provably fails a
    partition-column predicate is skipped during the WALK itself —
    never listed, never stat-ed.  Observable two ways: the returned
    total counts only files CONSIDERED, and a directory filter spy sees
    each partition segment exactly once per prune."""
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    zm.build_zonemap(path, ["score"])
    all_files = len(zm._data_files(path))

    # partition predicate: only lang=1's files are enumerated
    keep, total = zm.prune_files_multi(
        path, [("lang", "1", "1"), ("score", 0.0, 1e9)]
    )
    per_lang = len(zm._data_files(os.path.join(path, "lang=1")))
    assert total == per_lang < all_files
    assert sorted(keep) == sorted(
        zm._data_files(os.path.join(path, "lang=1"))
    )
    # result still equals the full scan
    got = zm.read_pruned_multi(
        spark, path, [("lang", "1", "1"), ("score", 0.0, 1e9)]
    )
    expect = df.filter("lang = '1'")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in expect.collect()
    )
    # a predicate killing EVERY partition enumerates nothing
    keep, total = zm.prune_files_multi(path, [("lang", "9", "9")])
    assert keep == [] and total == 0
    # no partition predicate -> full enumeration, unchanged semantics
    _, total = zm.prune_files_multi(path, [("score", 0.0, 1e9)])
    assert total == all_files
    # the dataset-wide denominator for skip ratios is count_data_files —
    # NOT the partition-constrained total (advice r8: a ratio against
    # the post-walk count over-reports pruning effectiveness)
    assert zm.count_data_files(path) == all_files > per_lang


def test_update_rewrites_only_dirty_shards(spark, tmp_path):
    """Per-micro-batch maintenance cost model: an append touching ONE
    partition rewrites that partition's shard (and nothing else) — the
    untouched shards and the root marker keep their exact mtimes, so at
    100k partitions a batch pays O(touched partitions) manifest writes,
    not O(partitions)."""
    import time as _t

    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["score"])

    def mtimes():
        return {
            d: os.stat(os.path.join(path, d, zm.MANIFEST_NAME)).st_mtime_ns
            for d in ("lang=0", "lang=1", "lang=2")
        } | {"": os.stat(os.path.join(path, zm.MANIFEST_NAME)).st_mtime_ns}

    before = mtimes()
    _t.sleep(0.02)
    # no-op update: nothing changed, nothing rewritten
    zm.update_zonemap(path)
    assert mtimes() == before

    # append one file into lang=1 only
    extra = spark.createDataFrame(
        [(9001, "1", 9999.0)], "doc_id long, lang string, score double"
    )
    extra.coalesce(1).write.mode("append").partitionBy("lang").parquet(path)
    _t.sleep(0.02)
    zm.update_zonemap(path)
    after = mtimes()
    assert after["lang=1"] != before["lang=1"]
    for k in ("lang=0", "lang=2", ""):
        assert after[k] == before[k]
    # and the new file is covered
    keep, _ = zm.prune_files_multi(path, [("score", 9000.0, 10000.0)])
    assert any("lang=1" in f for f in keep)


def test_dirs_update_requires_cols_and_covers_new_partition(spark, tmp_path):
    """dirs-mode inherits columns per-dir, so (a) explicit cols are
    required, and (b) a brand-new partition directory gets a fresh,
    fully-covered shard."""
    import pytest

    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["score"])
    with pytest.raises(ValueError, match="requires explicit cols"):
        zm.update_zonemap(path, dirs=["lang=0"])
    # new partition value never seen by the build
    extra = spark.createDataFrame(
        [(9001, "7", 777.0)], "doc_id long, lang string, score double"
    )
    extra.coalesce(1).write.mode("append").partitionBy("lang").parquet(path)
    out = zm.update_zonemap(path, ["score"], dirs=["lang=7"])
    assert out and all(r.startswith("lang=7") for r in out)
    assert all("score" in z for z in out.values())
    keep, _ = zm.prune_files_multi(path, [("score", 700.0, 800.0)])
    assert any("lang=7" in f for f in keep)


def test_dirs_update_non_leaf_nested_partitioning(spark, tmp_path):
    """A NON-leaf dirs entry over nested partitioning (a=.../b=...)
    updates each leaf's own shard — shard manifests are leaf-level and
    basename-keyed, so collapsing sub-paths would corrupt rel keys."""
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, str(i % 2), str(i % 3), float(i)) for i in range(60)],
        "doc_id long, a string, b string, score double",
    )
    write_sharded(df, path, partition_cols=["a", "b"], sort_cols=["score"])
    zm.build_zonemap(path, ["score"])
    extra = spark.createDataFrame(
        [(9001, "0", "1", 9999.0)], "doc_id long, a string, b string, score double"
    )
    extra.coalesce(1).write.mode("append").partitionBy("a", "b").parquet(path)
    out = zm.update_zonemap(path, ["score"], dirs=["a=0"])  # non-leaf
    # every returned rel is a real file path relative to the dataset root
    for rel in out:
        assert os.path.isfile(os.path.join(path, rel))
    # full coverage: merged manifest covers every file, rel keys correct
    manifest = zm.load_zonemap(path)
    rels = sorted(os.path.relpath(f, path) for f in zm._data_files(path))
    assert sorted(manifest) == rels
    keep, _ = zm.prune_files_multi(path, [("score", 9000.0, 10000.0)])
    assert any("a=0" in f and "b=1" in f for f in keep)
