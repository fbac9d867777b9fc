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
