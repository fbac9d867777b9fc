"""Sharded dataset layout: partition pruning reaches the file listing,
files are clustered per partition and sorted within, round-trip is exact."""

from __future__ import annotations

import pyarrow.parquet as pq

from big_data_engineering_financial_analysis_spark.sources.dataset import (
    read_dataset,
    write_sharded,
)
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

from tests.conftest import SF_SMALL


def _write(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_ds")
    write_sharded(docs, path, partition_cols=["lang"], sort_cols=["doc_id"])
    return docs, path


def test_round_trip_exact(spark, tmp_path):
    docs, path = _write(spark, tmp_path)
    back = read_dataset(spark, path)
    assert back.count() == docs.count()
    a = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "text", "lang", "source", "n_chars"):
        assert (a[c] == b[c]).all(), c


def test_partition_pruning_hits_file_listing(spark, tmp_path):
    _, path = _write(spark, tmp_path)
    langs = [r["lang"] for r in read_dataset(spark, path).select("lang").distinct().collect()]
    assert len(langs) >= 2, "fixture must have multiple langs"
    target = sorted(langs)[0]

    filtered = read_dataset(spark, path).filter(f"lang = '{target}'")
    # runtime proof: the files the scan ACTUALLY reads (inputFiles() lists
    # the relation's full index, pre-pruning)
    from pyspark.sql import functions as F

    read_files = [
        r[0]
        for r in filtered.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files, "pruned scan reads at least one file"
    assert all(f"lang={target}" in f for f in read_files), read_files[:3]
    # and the physical plan carries the PartitionFilters clause
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan


def test_files_sorted_within_and_clustered(spark, tmp_path):
    _, path = _write(spark, tmp_path)
    files = read_dataset(spark, path).inputFiles()
    assert files
    for f in files:
        local = f.replace("file://", "").replace("file:", "")
        ids = pq.read_table(local, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), f"{local} not sorted on doc_id"


def test_max_records_per_file_split(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_small_files")
    write_sharded(
        docs, path, partition_cols=["lang"], sort_cols=["doc_id"],
        max_records_per_file=10,
    )
    back = read_dataset(spark, path)
    assert back.count() == docs.count()
    for f in back.inputFiles():
        local = f.replace("file://", "").replace("file:", "")
        assert pq.read_table(local).num_rows <= 10


def test_compaction_consolidates_and_preserves(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources.dataset import compact_dataset

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "to_compact")
    # simulate micro-batch rot: many tiny files per partition
    write_sharded(
        docs, path, partition_cols=["lang"], sort_cols=["doc_id"],
        max_records_per_file=5,
    )
    n_before = len(read_dataset(spark, path).inputFiles())
    before = read_dataset(spark, path).toPandas().sort_values("doc_id")

    compact_dataset(spark, path, partition_cols=["lang"], sort_cols=["doc_id"])

    after_df = read_dataset(spark, path)
    n_after = len(after_df.inputFiles())
    assert n_after < n_before, (n_before, n_after)
    after = after_df.toPandas().sort_values("doc_id")
    assert len(after) == len(before)
    assert (before["text"].to_numpy() == after["text"].to_numpy()).all()
    # clustering invariant survives: every file still sorted on doc_id
    for f in after_df.inputFiles():
        local = f.replace("file://", "").replace("file:", "")
        ids = pq.read_table(local, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)


def test_schema_evolution_merge(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "evolving")
    write_sharded(docs, path, partition_cols=["lang"], sort_cols=["doc_id"])
    # a later writer adds a column (append with evolved schema)
    evolved = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "score", F.lit(0.5)
    )
    evolved.repartition("lang").sortWithinPartitions("lang", "doc_id").write.mode(
        "append"
    ).partitionBy("lang").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "score" in merged.columns
    assert merged.count() == 2 * docs.count()
    old = merged.filter("doc_id < 1000000")
    assert old.filter("score IS NOT NULL").count() == 0  # NULL-filled


def test_describe_dataset(spark, tmp_path):
    """describe_dataset reports file/row/partition/index/snapshot state
    from metadata only, and its counts agree with ground truth."""
    from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
    from big_data_engineering_financial_analysis_spark.sources import snapshots as sn
    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
        describe_dataset,
    )

    path = str(tmp_path / "ds")
    df = load_table(spark, SF_SMALL, "orders").limit(500)
    write_sharded(
        df, path, partition_cols=["o_orderstatus"], sort_cols=["o_orderkey"],
        max_records_per_file=100,
    )
    zm.build_zonemap(path, ["o_orderkey"])
    bs.build_bloom_index(path, ["o_custkey"])
    v1 = sn.commit_snapshot(path)

    d = describe_dataset(path)
    assert d["rows"] == 500 == spark.read.parquet(path).count()
    assert d["files"] == len(zm._data_files(path)) > 1
    assert d["partition_cols"] == ["o_orderstatus"]
    assert d["zonemap_cols"] == ["o_orderkey"]
    assert d["bloom_cols"] == ["o_custkey"]
    assert d["zonemap_coverage"] == d["bloom_coverage"] == d["files"]
    assert d["snapshots"] == [v1]
    assert d["snapshot_modes"] == {v1: "link"}
    assert d["snapshot_retained_files"] == 0
    assert d["bloom_sharded"] is True  # o_orderstatus-partitioned layout
    assert d["zonemap_sharded"] is True
    assert d["committed_batches"] == 0
    assert d["pending_compaction_recovery"] is False
    assert d["bytes"] > 0

    # manifest-mode snapshot + compaction: the retained pool and the
    # per-version mode show up in the same single dict
    v2 = sn.commit_snapshot(path, mode="manifest")
    compact_dataset(spark, path, ["o_orderstatus"], ["o_orderkey"])
    d2 = describe_dataset(path)
    assert d2["snapshot_modes"] == {v1: "link", v2: "manifest"}
    assert d2["snapshot_retained_files"] > 0
    assert d2["rows"] == 500
