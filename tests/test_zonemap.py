"""Zone-map file pruning: result always equals full-scan + filter, and
the manifest actually skips files."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

T0 = dt.datetime(2024, 1, 1)


def _rows(n=400):
    return [
        {
            "doc_id": i,
            "lang": "en" if i % 4 else "de",
            "score": float(i % 100),
            "ts": T0 + dt.timedelta(minutes=i),
        }
        for i in range(n)
    ]


def _write(spark, path):
    df = spark.createDataFrame(_rows())
    write_sharded(
        df, path, partition_cols=["lang"], sort_cols=["doc_id"],
        max_records_per_file=50,
    )
    return df


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_pruned_read_equals_filter_and_skips_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id", "score", "ts"])

    keep, total = zm.prune_files(path, "doc_id", lo=100, hi=140)
    assert total > 4  # maxRecordsPerFile made a multi-file dataset
    assert len(keep) < total  # zones on the sort key actually prune

    got = zm.read_pruned(spark, path, "doc_id", lo=100, hi=140)
    exp = (
        spark.read.parquet(path)
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") <= 140))
    )
    assert _ids(got) == _ids(exp) == list(range(100, 141))
    # partition columns recovered through basePath
    assert set(got.columns) == set(exp.columns)


def test_timestamp_zone_pruning(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["ts"])
    lo, hi = T0 + dt.timedelta(minutes=50), T0 + dt.timedelta(minutes=60)
    got = zm.read_pruned(spark, path, "ts", lo=lo, hi=hi)
    assert _ids(got) == list(range(50, 61))


def test_unknown_appended_file_is_kept(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id"])
    # append new data AFTER the manifest build: must still be scanned
    extra = spark.createDataFrame(
        [{"doc_id": 10_000, "lang": "en", "score": 1.0,
          "ts": T0 + dt.timedelta(days=30)}]
    )
    extra.coalesce(1).write.mode("append").partitionBy("lang").parquet(path)
    got = zm.read_pruned(spark, path, "doc_id", lo=9_999, hi=10_001)
    assert _ids(got) == [10_000]


def test_stale_manifest_never_changes_results(spark, tmp_path):
    """Deleted files are ignored; pruning is only ever an optimization."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id"])
    # blow a partition away after the build
    import shutil

    shutil.rmtree(os.path.join(path, "lang=de"))
    got = zm.read_pruned(spark, path, "doc_id", lo=0, hi=50)
    exp = (
        spark.read.parquet(path)
        .filter((F.col("doc_id") >= 0) & (F.col("doc_id") <= 50))
    )
    assert _ids(got) == _ids(exp)


def test_disjoint_range_returns_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id"])
    keep, _total = zm.prune_files(path, "doc_id", lo=10_000)
    assert keep == []
    got = zm.read_pruned(spark, path, "doc_id", lo=10_000)
    assert got.count() == 0
    assert "doc_id" in got.columns


def test_compaction_rebuilds_manifest_atomically(spark, tmp_path):
    """compact_dataset replaces every data file; a manifest built before
    compaction must be rebuilt on the new files in the same swap."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
    )

    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id"])
    before = set(zm.load_zonemap(path))
    compact_dataset(
        spark, path, partition_cols=["lang"], sort_cols=["doc_id"],
        max_records_per_file=50,
    )
    manifest = zm.load_zonemap(path)
    assert manifest is not None and set(manifest) != before  # new files
    # every current data file is covered -> pruning is effective again
    keep, total = zm.prune_files(path, "doc_id", lo=100, hi=140)
    assert len(keep) < total
    got = zm.read_pruned(spark, path, "doc_id", lo=100, hi=140)
    assert _ids(got) == list(range(100, 141))


def test_zorder_plus_zonemap_two_dimensional_skip(spark, tmp_path):
    """Sorting files by the Morton key makes the zone map prune on BOTH
    dimensions of a 2-D range query — the z-order payoff at file level."""
    from big_data_engineering_financial_analysis_spark.operators.layout import zvalue

    path = str(tmp_path / "zds")
    n = 32
    rows = [
        {"x": i, "y": j, "payload": float(i * n + j)}
        for i in range(n)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "zkey", zvalue(F.col("x"), F.col("y"))
    )
    df.repartition(1).sortWithinPartitions("zkey").write.option(
        "maxRecordsPerFile", 64
    ).parquet(path)
    zm.build_zonemap(path, ["x", "y", "zkey"])

    # a small 2-D box: prune on x, then on y, intersect file sets
    kx, total = zm.prune_files(path, "x", lo=4, hi=7)
    ky, _ = zm.prune_files(path, "y", lo=4, hi=7)
    both = sorted(set(kx) & set(ky))
    assert total == 16
    assert len(both) < len(kx) and len(both) < len(ky)  # both dims prune
    assert len(both) <= 4  # z-locality: a 4x4 box touches few 64-row tiles

    got = (
        spark.read.parquet(*both)
        .filter((F.col("x").between(4, 7)) & (F.col("y").between(4, 7)))
        .count()
    )
    assert got == 16  # every row of the box survives the file pruning


def test_all_null_zone_dropped_for_ranges(spark, tmp_path):
    path = str(tmp_path / "ds")
    rows = [
        {"doc_id": i, "maybe": None if i < 50 else float(i)} for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, maybe double")
    # two files: one all-NULL in `maybe`, one populated
    df.filter("doc_id < 50").coalesce(1).write.parquet(path)
    df.filter("doc_id >= 50").coalesce(1).write.mode("append").parquet(path)
    zm.build_zonemap(path, ["maybe"])
    keep, total = zm.prune_files(path, "maybe", lo=0.0)
    assert total == 2 and len(keep) == 1  # the all-NULL file is skipped
    got = zm.read_pruned(spark, path, "maybe", lo=0.0)
    assert got.count() == 50
    # boundless read: NO range to prune against — the all-NULL file's
    # rows are part of the dataset and must come back (regression: an
    # unconditional null-zone skip silently lost them)
    keep, total = zm.prune_files(path, "maybe")
    assert len(keep) == total == 2
    assert zm.read_pruned(spark, path, "maybe").count() == 100


def test_update_zonemap_covers_appends_incrementally(spark, tmp_path):
    """update_zonemap footer-scans only the new files (O(new), not
    O(all)), inherits the column set, and reaps deleted entries."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id"])
    before = zm.load_zonemap(path)
    extra = spark.createDataFrame(
        [{"doc_id": 10_000, "lang": "en", "score": 1.0,
          "ts": T0 + dt.timedelta(days=30)}]
    )
    extra.coalesce(1).write.mode("append").partitionBy("lang").parquet(path)
    after = zm.update_zonemap(path)  # columns inherited from the manifest
    assert set(before) < set(after)
    new_rel = (set(after) - set(before)).pop()
    assert "doc_id" in after[new_rel]  # the append IS zone-covered
    for rel in before:
        assert after[rel] == before[rel]  # untouched files not rescanned

    # now the appended file prunes like any other
    keep, total = zm.prune_files(path, "doc_id", lo=9_999)
    assert [k for k in keep] == [k for k in keep if new_rel in k]
    # deleted files drop out of the manifest
    import shutil

    shutil.rmtree(os.path.join(path, "lang=de"))
    healed = zm.update_zonemap(path)
    assert all("lang=de" not in rel for rel in healed)


def test_multi_predicate_prune_and_read(spark, tmp_path):
    """Conjunctive pruning intersects zones; the read still equals a
    full scan with both filters."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["doc_id", "score"])
    preds = [("doc_id", 100, 200), ("score", 10.0, 20.0)]
    keep_multi, total = zm.prune_files_multi(path, preds)
    keep_one, _ = zm.prune_files(path, "doc_id", 100, 200)
    assert len(keep_multi) <= len(keep_one)
    got = zm.read_pruned_multi(spark, path, preds)
    exp = (
        spark.read.parquet(path)
        .filter(F.col("doc_id").between(100, 200))
        .filter(F.col("score").between(10.0, 20.0))
    )
    assert _ids(got) == _ids(exp)


def test_incomparable_bound_type_keeps_file(spark, tmp_path):
    """A bound the stored stats cannot compare with must not crash the
    read — plain scan+filter would succeed, so pruning must too."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    zm.build_zonemap(path, ["lang"])  # string stats
    keep, total = zm.prune_files(path, "lang", lo=0)  # int bound
    assert len(keep) == total  # nothing pruned, nothing raised


def test_manifest_write_is_atomic_swap(spark, tmp_path):
    """_write_manifest goes through a temp file + os.replace: no .tmp
    leftovers, and the manifest on disk is always complete valid JSON
    (an in-place truncating write could be observed half-written)."""
    import json
    import os

    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm

    path = str(tmp_path / "ds")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(path)
    m1 = zm.build_zonemap(path, ["id"])
    m2 = zm.update_zonemap(path, ["v"])
    files = os.listdir(path)
    assert not [f for f in files if ".tmp." in f], files
    on_disk = json.load(open(os.path.join(path, zm.MANIFEST_NAME)))
    assert on_disk == m2 and set(m1) == set(m2)


def test_naive_bound_prunes_aware_stats(spark, tmp_path):
    """A naive datetime bound against UTC-aware parquet stats must still
    PRUNE (UTC alignment), not silently degrade to keep-everything via
    the TypeError guard — the round-6 skip-and-serve regression."""
    import datetime as dt

    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
    from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

    path = str(tmp_path / "tsds")
    t0 = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [("k", t0 + dt.timedelta(hours=i), float(i)) for i in range(100)],
        "part string, ts timestamp, v double",
    )
    write_sharded(df, path, ["part"], ["ts"], max_records_per_file=25)
    zm.build_zonemap(path, ["ts"])
    keep, total = zm.prune_files_multi(
        path, [("ts", t0, t0 + dt.timedelta(hours=10))]  # naive bounds
    )
    assert total >= 4 and 0 < len(keep) < total, (len(keep), total)
    got = zm.read_pruned_multi(
        spark, path, [("ts", t0, t0 + dt.timedelta(hours=10))]
    ).count()
    assert got == 11


def test_distributed_build_matches_sequential(spark, tmp_path):
    """`build_zonemap(spark=...)` fans the per-file footer reads out over
    executors (r10 — the compactor's last O(all files) sequential driver
    pass); the manifest must be identical to the driver-sequential build
    (zones are deterministic functions of file footers), evolution gaps
    included."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    seq = zm.build_zonemap(path, ["ts", "value"])
    dist = zm.build_zonemap(path, ["ts", "value"], spark=spark)
    assert dist == seq and len(dist) > 2
    assert zm.load_zonemap(path) == seq
