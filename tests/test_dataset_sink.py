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


def test_empty_cols_index_falls_back_to_full_update(spark, tmp_path):
    """Advice r8 regression: ``zonemap_cols=["doc_id"]`` +
    ``bloom_cols=[]`` + partition_cols raised ValueError in EVERY
    micro-batch — ``touched`` was computed whenever either index was
    configured and passed to both updaters, and the updaters reject
    ``dirs=...`` with empty cols.  ``cols=[]`` keeps its historical
    meaning ("maintain whatever the manifest already covers", a no-op
    when no manifest exists) by taking the full-update path; the
    explicit-cols index still gets dirs-bounded maintenance."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    for lo, hi in [(0, 80), (80, 160)]:
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
                bloom_cols=[],  # maintain-existing: must not raise
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 160
    # the explicit-cols zone map is still fully maintained
    manifest = zm.load_zonemap(out)
    assert sorted(manifest) == sorted(
        os.path.relpath(f, out) for f in zm._data_files(out)
    )
    keep, total = zm.prune_files(out, "doc_id", lo=150)
    assert 0 < len(keep) < total


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


def test_snapshot_cadence(spark, tmp_path):
    """snapshot_every=2 pins a version after every 2nd COMMITTED batch;
    replays never re-snapshot; each pinned version holds exactly the rows
    committed up to its cut point, immune to later appends."""
    from big_data_engineering_financial_analysis_spark.sources import snapshots as sn

    out = str(tmp_path / "ds")
    sink = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"],
        zonemap_cols=["doc_id"], snapshot_every=2,
    )
    sink(_chunk(spark, 0, 30), 0)
    assert sn.snapshot_versions(out) == []  # 1 committed batch: no cut yet
    sink(_chunk(spark, 30, 50), 1)
    v1 = sn.snapshot_versions(out)
    assert len(v1) == 1  # 2nd commit -> first cut
    sink(_chunk(spark, 30, 50), 1)  # replay: no new snapshot
    assert sn.snapshot_versions(out) == v1
    sink(_chunk(spark, 50, 90), 2)
    sink(_chunk(spark, 90, 100), 3)
    versions = sn.snapshot_versions(out)
    assert len(versions) == 2  # 4th commit -> second cut
    # cut points are exact and immutable
    assert sn.read_snapshot(spark, out, versions[0]).count() == 50
    assert sn.read_snapshot(spark, out, versions[1]).count() == 100
    assert spark.read.parquet(out).count() == 100


def test_snapshot_cadence_heals_crash_skipped_cut(spark, tmp_path):
    """Crash window: marker written, snapshot not yet committed.  The cut
    must land at the next call (replay or next batch) — never be silently
    skipped for a whole cadence period."""
    import os

    from big_data_engineering_financial_analysis_spark.sources import snapshots as sn

    out = str(tmp_path / "ds")
    sink = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"], snapshot_every=2,
    )
    sink(_chunk(spark, 0, 30), 0)
    # simulate: batch 1 committed its data + marker, crashed pre-snapshot
    spark.createDataFrame(
        [(i, "xx") for i in range(30, 50)], ["doc_id", "lang"]
    ).write.mode("append").partitionBy("lang").parquet(out)
    os.makedirs(os.path.join(out, "_batches", "1"))
    assert sn.snapshot_versions(out) == []

    # a fresh sink instance (restart) replaying batch 1 heals the cut
    sink2 = dataset_sink(
        out, partition_cols=["lang"], sort_cols=["doc_id"], snapshot_every=2,
    )
    sink2(_chunk(spark, 30, 50), 1)  # replay: marker exists, data skipped
    versions = sn.snapshot_versions(out)
    assert len(versions) == 1
    assert sn.read_snapshot(spark, out, versions[0]).count() == 50
    assert spark.read.parquet(out).count() == 50  # replay appended nothing


def test_snapshot_every_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="snapshot_every"):
        dataset_sink("/tmp/x", ["lang"], ["doc_id"], snapshot_every=0)


def test_ingest_to_serve_end_to_end(spark, tmp_path):
    """The reference's full architecture in engine terms: a candle stream
    appends into the partitioned at-rest store (consumer -> QuestDB), and
    the dashboard's time-range read is served with file skipping
    (Grafana -> daily partitions).  Proves (1) TIME zones exist on
    streamed appends — the INT96 regression guard for the streaming
    writer path — (2) the pruned serve equals a batch filter, (3) files
    outside the range are skipped."""
    import datetime as dt

    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.sources.zonemap import (
        prune_files_multi,
        read_pruned_multi,
    )

    t0 = dt.datetime(2024, 1, 1)
    cschema = "stock_symbol string, local_time timestamp, close double"

    def chunk(day_lo, day_hi):
        return spark.createDataFrame(
            [
                (sym, t0 + dt.timedelta(days=d, hours=h), float(100 + d + h))
                for sym in ("A", "B")
                for d in range(day_lo, day_hi)
                for h in range(0, 24, 6)
            ],
            cschema,
        )

    src = str(tmp_path / "candles_src")
    out = str(tmp_path / "stock_data")
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        chunk(lo, hi).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(cschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            dataset_sink(
                out,
                partition_cols=["stock_symbol"],
                sort_cols=["local_time"],
                zonemap_cols=["local_time"],
                max_records_per_file=20,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    lo = dt.datetime(2024, 1, 5)
    hi = dt.datetime(2024, 1, 12)
    keep, total = prune_files_multi(out, [("local_time", lo, hi)])
    assert 0 < len(keep) < total, f"no skipping: {len(keep)}/{total}"
    served = (
        read_pruned_multi(spark, out, [("local_time", lo, hi)])
        .filter(F.col("stock_symbol") == "A")
        .select("local_time", "close")
    )
    batch = (
        spark.read.parquet(src)
        .filter(
            (F.col("stock_symbol") == "A")
            & (F.col("local_time") >= F.lit(lo))
            & (F.col("local_time") <= F.lit(hi))
        )
        .select("local_time", "close")
    )
    assert sorted(served.collect()) == sorted(batch.collect())
    assert served.count() > 0


def test_streaming_appends_keep_bloom_sidecar_current(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs

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
                bloom_cols=["doc_id"],
                max_records_per_file=40,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # every data file is sidecar-covered after 3 commits
    manifest = bs.load_bloom_index(out)
    data_files = zm._data_files(out)
    assert sorted(manifest) == sorted(
        os.path.relpath(f, out) for f in data_files
    )

    # point-lookup serving read: equal to filter, and it actually skips
    keep, total = bs.prune_files_eq(out, "doc_id", [42])
    assert 0 < len(keep) < total
    got = bs.read_point(spark, out, "doc_id", [42])
    assert [r.doc_id for r in got.collect()] == [42]


def test_sink_maintains_only_touched_partition_shards(spark, tmp_path):
    """Per-batch sidecar maintenance is bounded by the partitions the
    batch touched: a batch writing only lang=de rewrites lang=de's
    shard manifests and leaves lang=en's (bytes AND mtimes) untouched —
    while coverage stays complete for both."""
    import time as _t

    from big_data_engineering_financial_analysis_spark.sources import (
        bloomskip as bs,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    # batch 1: both langs; batch 2: de only (ids divisible by 4)
    _chunk(spark, 0, 100).coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                dataset_sink(
                    out,
                    partition_cols=["lang"],
                    sort_cols=["doc_id"],
                    zonemap_cols=["doc_id"],
                    bloom_cols=["doc_id"],
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()

    def mtimes():
        return {
            name: os.stat(os.path.join(out, "lang=en", name)).st_mtime_ns
            for name in (zm.MANIFEST_NAME, bs.MANIFEST_NAME)
        }

    before = mtimes()
    _t.sleep(0.02)
    de_only = _chunk(spark, 100, 200).filter(F.col("lang") == "de")
    de_only.coalesce(1).write.mode("append").parquet(src)
    run()

    assert mtimes() == before  # en shards never visited, let alone rewritten
    # coverage complete anyway: every data file is manifest-covered
    manifest = zm.load_zonemap(out)
    blooms = bs.load_bloom_index(out)
    rels = sorted(os.path.relpath(f, out) for f in zm._data_files(out))
    assert sorted(manifest) == rels and sorted(blooms) == rels
    # and the pruned read still equals the full scan
    keep, _ = zm.prune_files(out, "doc_id", lo=150)
    assert keep and all("lang=de" in f for f in keep)
    got = zm.read_pruned(spark, out, "doc_id", lo=150)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id
        for r in spark.read.parquet(out).filter("doc_id >= 150").collect()
    )


def test_sink_touched_dirs_with_escaped_partition_values(spark, tmp_path):
    """Partition values containing characters Spark percent-escapes in
    directory names (here ':') must still route through the
    dirs-bounded maintenance (or safely fall back to the full update) —
    coverage stays complete either way."""
    from big_data_engineering_financial_analysis_spark.sources import (
        bloomskip as bs,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [
            {"doc_id": i, "lang": f"a:{i % 2}", "score": float(i),
             "ts": T0 + dt.timedelta(minutes=i)}
            for i in range(80)
        ],
        SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            dataset_sink(
                out,
                partition_cols=["lang"],
                sort_cols=["doc_id"],
                zonemap_cols=["doc_id"],
                bloom_cols=["doc_id"],
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # Spark escaped the ':' in the directory names
    assert any("%3A" in d for d in os.listdir(out) if d.startswith("lang="))
    # sidecar coverage is complete for every data file regardless of path
    manifest = zm.load_zonemap(out)
    from big_data_engineering_financial_analysis_spark.sources import (
        bloomskip as _bs,
    )

    blooms = _bs.load_bloom_index(out)
    rels = sorted(os.path.relpath(f, out) for f in zm._data_files(out))
    assert sorted(manifest) == rels and sorted(blooms) == rels
    # pruned point read equals full scan
    got = bs.read_skipped(spark, out, eq=[("doc_id", [7])])
    assert sorted(r.doc_id for r in got.collect()) == [7]


def test_align_schema_guards_evolved_restart(spark, tmp_path):
    """A restarted stream whose producer drifted the schema (int id, a
    dropped column, a NEW column) must keep the dataset mergeSchema-
    readable: ``align_schema=True`` widens losslessly, backfills typed
    NULLs, and passes the new column through — and the sidecar
    maintenance records evolution gaps so the new column prunes the
    whole touched history."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out = str(tmp_path / "ds")
    _chunk(spark, 0, 80).coalesce(1).write.parquet(src1)
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src1)
        .writeStream.foreachBatch(
            dataset_sink(
                out,
                partition_cols=["lang"],
                sort_cols=["doc_id"],
                zonemap_cols=["doc_id"],
                align_schema=True,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck_a"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # generation 2: doc_id arrives as INT, 'score' is gone, 'vote' is new
    SCHEMA2 = "doc_id int, lang string, ts timestamp, vote double"
    spark.createDataFrame(
        [
            {
                "doc_id": i,
                "lang": "en" if i % 4 else "de",
                "ts": T0 + dt.timedelta(minutes=i),
                "vote": float(i),
            }
            for i in range(1000, 1080)
        ],
        SCHEMA2,
    ).coalesce(1).write.parquet(src2)
    q2 = (
        spark.readStream.schema(SCHEMA2)
        .parquet(src2)
        .writeStream.foreachBatch(
            dataset_sink(
                out,
                partition_cols=["lang"],
                sort_cols=["doc_id"],
                zonemap_cols=["doc_id", "vote"],
                align_schema=True,
                # a fresh checkpoint restarts batch ids at 0 — without
                # its own writer_id this query's batches would collide
                # with generation 1's markers and be dropped as replays
                writer_id="gen2",
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck_b"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert back.count() == 160
    assert dict(back.dtypes)["doc_id"] == "bigint"  # int widened, not drifted
    assert back.filter("doc_id >= 1000 AND score IS NOT NULL").count() == 0
    assert back.filter("doc_id < 1000 AND vote IS NOT NULL").count() == 0
    # evolution gaps recorded by the sink's own dirs-bounded maintenance:
    # a vote-range query prunes the pre-evolution files
    keep, _ = zm.prune_files(out, "vote", lo=0.0, hi=2000.0)
    assert keep and len(keep) < zm.count_data_files(out)


def test_writer_id_validated_at_construction(tmp_path):
    import pytest

    from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import _marker_name

    for bad in ("_backfill", "jobs/gen2", "a b", ""):
        with pytest.raises(ValueError):
            dataset_sink(
                str(tmp_path / "ds"), ["lang"], ["doc_id"], writer_id=bad
            )
    assert _marker_name("gen2", 7) == "gen2-7"
    assert _marker_name(None, 7) == "7"


def test_align_schema_exempts_partition_columns(spark, tmp_path):
    """Partition-column types come from DIRECTORY-NAME inference on the
    merged read (a long day_id reads back as int), which must never make
    alignment refuse a consistent producer: the partition columns pass
    through as the batch's own."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    S = "doc_id long, day_id long, score double"
    rows1 = spark.createDataFrame(
        [{"doc_id": i, "day_id": i % 3, "score": float(i)} for i in range(40)], S
    )
    rows1.coalesce(1).write.parquet(src)

    def run(ck, wid):
        q = (
            spark.readStream.schema(S)
            .parquet(src)
            .writeStream.foreachBatch(
                dataset_sink(
                    out,
                    partition_cols=["day_id"],
                    sort_cols=["doc_id"],
                    align_schema=True,
                    writer_id=wid,
                )
            )
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run("ck1", "w1")
    # second incarnation, same long-typed day_id: batch 1+ resolves the
    # align target from the existing dataset — directory inference says
    # day_id is int, and without the exemption this raised TypeError
    spark.createDataFrame(
        [{"doc_id": 100 + i, "day_id": i % 3, "score": float(i)} for i in range(40)],
        S,
    ).coalesce(1).write.mode("append").parquet(src)
    run("ck2", "w2")
    back = spark.read.parquet(out)
    assert back.count() == 120  # w2 reprocessed all 80 src rows + w1's 40
