"""Streaming dataset sink: appends land in the sharded layout, the
zone map stays current per commit, and batch replays are idempotent."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import (
    dataset_sink,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = "doc_id long, lang string, score double, ts timestamp"


def _chunk(spark, lo, hi):
    return spark.createDataFrame(
        [
            {
                "doc_id": i,
                "lang": "en" if i % 4 else "de",
                "score": float(i % 100),
                "ts": T0 + dt.timedelta(minutes=i),
            }
            for i in range(lo, hi)
        ],
        SCHEMA,
    )


def test_streaming_appends_keep_zonemap_current(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        _chunk(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            dataset_sink(
                out,
                partition_cols=["lang"],
                sort_cols=["doc_id"],
                zonemap_cols=["doc_id"],
                max_records_per_file=40,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    full = spark.read.parquet(out)
    assert full.count() == 300

    # every data file is manifest-covered (no stale gaps after 3 commits)
    manifest = zm.load_zonemap(out)
    data_files = zm._data_files(out)
    assert sorted(manifest) == sorted(
        os.path.relpath(f, out) for f in data_files
    )

    # pruned serving read: equal to filter, and it actually skips files
    keep, total = zm.prune_files(out, "doc_id", lo=250)
    assert 0 < len(keep) < total
    got = zm.read_pruned(spark, out, "doc_id", lo=250)
    assert got.count() == 50
    assert sorted(r.doc_id for r in got.collect()) == list(range(250, 300))


def test_replay_markers_survive_compaction(spark, tmp_path):
    """Compaction rewrites every data file; the _batches replay markers
    must ride along or a post-compaction crash replay double-appends."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
    )

    out = str(tmp_path / "ds")
    sink = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"],
        zonemap_cols=["doc_id"],
    )
    sink(_chunk(spark, 0, 50), 0)
    sink(_chunk(spark, 50, 100), 1)
    compact_dataset(spark, out, ["lang"], ["doc_id"])
    sink(_chunk(spark, 0, 50), 0)  # crash replay AFTER compaction
    assert spark.read.parquet(out).count() == 100  # no double-append
    # and the sink keeps going with fresh batches
    sink(_chunk(spark, 100, 120), 2)
    assert spark.read.parquet(out).count() == 120
    assert zm.read_pruned(spark, out, "doc_id", lo=100).count() == 20


def test_replayed_batch_is_skipped(spark, tmp_path):
    out = str(tmp_path / "ds")
    sink = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"],
        zonemap_cols=["doc_id"],
    )
    sink(_chunk(spark, 0, 50), 0)
    n_files = len(zm._data_files(out))
    sink(_chunk(spark, 0, 50), 0)  # replay of batch 0: must be a no-op
    assert len(zm._data_files(out)) == n_files
    assert spark.read.parquet(out).count() == 50
    sink(_chunk(spark, 50, 80), 1)  # a NEW batch still lands
    assert spark.read.parquet(out).count() == 80
    assert zm.read_pruned(spark, out, "doc_id", lo=60).count() == 20
