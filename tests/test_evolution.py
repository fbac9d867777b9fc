"""Schema evolution: aligned appends keep one physical type per column,
merged reads yield the union schema, and BOTH skip indexes prove
pre-evolution files skippable on post-evolution columns (while partition
keys and boundless reads stay exempt)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm
from big_data_engineering_financial_analysis_spark.sources.dataset import (
    read_dataset,
    write_sharded,
)
from big_data_engineering_financial_analysis_spark.sources.evolution import (
    align_to_dataset,
    append_evolved,
    dataset_schema,
    read_evolved,
)


def _v1(spark, path: str) -> None:
    """Generation-1 dataset: (id long, v double, lang partition)."""
    df = spark.createDataFrame(
        [Row(id=i, v=float(i) / 10, lang="en" if i % 2 else "de") for i in range(40)]
    )
    write_sharded(df, path, partition_cols=["lang"], sort_cols=["id"])


def _v2(spark):
    """Generation-2 frame: drops ``v``, adds ``score``; ``id`` arrives
    as int (must widen to the dataset's long)."""
    return spark.createDataFrame(
        [
            Row(id=i, score=float(i), lang="en" if i % 2 else "de")
            for i in range(100, 130)
        ],
        schema=T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )


def test_align_widens_fills_and_appends_new(spark, tmp_path):
    path = str(tmp_path / "ds")
    _v1(spark, path)
    target = dataset_schema(spark, path)
    aligned = align_to_dataset(_v2(spark), target)
    by_name = {f.name: f.dataType for f in aligned.schema.fields}
    assert by_name["id"] == T.LongType()  # widened int -> long
    assert by_name["v"] == T.DoubleType()  # filled with typed NULL
    assert by_name["score"] == T.DoubleType()  # new column appended
    assert aligned.filter(F.col("v").isNotNull()).count() == 0
    # dataset columns first (stable order), new columns after
    assert aligned.columns[: len(target.fields)] == [f.name for f in target.fields]


def test_align_refuses_lossy_narrowing(spark, tmp_path):
    path = str(tmp_path / "ds")
    _v1(spark, path)
    bad = spark.createDataFrame(
        [Row(id="not-a-number", v=1.0, lang="en")]
    )  # string id vs long dataset id
    with pytest.raises(TypeError, match="id"):
        align_to_dataset(bad, dataset_schema(spark, path))
    long_v = spark.createDataFrame(
        [(1, 2, "en")],
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.LongType()),  # long vs double: lossy
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    with pytest.raises(TypeError, match="v"):
        align_to_dataset(long_v, dataset_schema(spark, path))


def test_append_evolved_round_trip(spark, tmp_path):
    path = str(tmp_path / "ds")
    _v1(spark, path)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    back = read_evolved(spark, path)
    assert back.count() == 70
    assert set(back.columns) == {"id", "v", "lang", "score"}
    # pre-evolution rows read NULL score; post-evolution rows NULL v
    assert back.filter("id < 100 AND score IS NOT NULL").count() == 0
    assert back.filter("id >= 100 AND v IS NOT NULL").count() == 0
    assert back.filter("id >= 100 AND score IS NULL").count() == 0
    # every file keeps a single physical type for id: merged read works
    # and types are the dataset's
    by_name = {f.name: f.dataType for f in back.schema.fields}
    assert by_name["id"] == T.LongType()
    # read_dataset merge_schema flag is the same read
    assert read_dataset(spark, path, merge_schema=True).count() == 70


def test_zonemap_prunes_pre_evolution_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _v1(spark, path)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    zm.build_zonemap(path, ["score", "id", "lang"])
    total = zm.count_data_files(path)
    keep, _ = zm.prune_files(path, "score", lo=100.0, hi=120.0)
    assert keep, "post-evolution files must survive"
    assert len(keep) < total, "pre-evolution files must be pruned"
    # the partition column is exempt: lang is never recorded all-NULL
    # even when explicitly requested (its values live in the path)
    manifest = zm.load_zonemap(path)
    assert all("lang" not in zones for zones in manifest.values())
    # boundless read keeps everything: result == full scan
    got = zm.read_pruned(
        spark, path, "score", lo=100.0, hi=120.0, merge_schema=True
    )
    expect = read_evolved(spark, path).filter(
        "score >= 100.0 AND score <= 120.0"
    )
    assert got.count() == expect.count() == 21


def test_bloom_skips_pre_evolution_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _v1(spark, path)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    bs.build_bloom_index(path, ["score"], spark=spark)
    total = zm.count_data_files(path)
    keep, _ = bs.prune_files_eq(path, "score", [105.0])
    assert keep and len(keep) < total
    got = bs.read_point(spark, path, "score", [105.0], merge_schema=True)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["id"] == 105
    # a value that exists nowhere skips every file, including the
    # empty-filter pre-evolution ones
    keep_none, _ = bs.prune_files_eq(path, "score", [9999.5])
    assert keep_none == []


def test_update_paths_record_evolution_gaps(spark, tmp_path):
    """Incremental sidecar maintenance (the streaming-sink path) records
    the same all-NULL zones / empty filters for pre-evolution files."""
    path = str(tmp_path / "ds")
    _v1(spark, path)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    zm.update_zonemap(path, ["score"])
    manifest = zm.load_zonemap(path)
    gaps = [z for z in manifest.values() if z.get("score", "absent") is None]
    assert gaps, "pre-evolution files must carry the all-NULL score zone"
    keep, _ = zm.prune_files(path, "score", lo=0.0, hi=1e9)
    assert len(keep) < zm.count_data_files(path)


def test_compaction_normalizes_evolved_schema(spark, tmp_path):
    """Compaction reads merged and rewrites, so it doubles as the
    schema-normalization step: afterwards every footer carries the
    union schema and plain un-merged reads see every column."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
        describe_dataset,
    )

    path = str(tmp_path / "ds")
    _v1(spark, path)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    assert describe_dataset(path)["footer_schemas"] == 2
    compact_dataset(spark, path, partition_cols=["lang"], sort_cols=["id"])
    desc = describe_dataset(path)
    assert desc["footer_schemas"] == 1
    assert set(desc["data_cols"]) == {"id", "v", "score"}
    # plain read (no mergeSchema) now sees the full schema
    back = spark.read.parquet(path)
    assert set(back.columns) == {"id", "v", "lang", "score"}
    assert back.count() == 70
    assert back.filter("id >= 100 AND score IS NULL").count() == 0


def test_zorder_compaction_restores_layout(spark, tmp_path):
    """Many small linear appends rot any clustering; compacting with
    zorder_cols rebuilds the Morton layout and its sidecar in place."""
    from pyspark.sql import Row

    from big_data_engineering_financial_analysis_spark.sources import zonemap as zmod
    from big_data_engineering_financial_analysis_spark.sources.dataset import compact_dataset

    path = str(tmp_path / "zc")
    for batch in range(4):  # appends in arrival order: no layout at all
        df = spark.createDataFrame(
            [
                Row(x=i % 64, y=(i * 31) % 64, id=batch * 1000 + i)
                for i in range(1000)
            ]
        )
        df.coalesce(4).write.mode("append").parquet(path)
    zmod.build_zonemap(path, ["x", "y"])
    keep_before, _ = zmod.prune_files(path, "y", lo=0, hi=7)
    assert len(keep_before) == zmod.count_data_files(path)  # nothing skips
    compact_dataset(
        spark, path, partition_cols=[], sort_cols=[], zorder_cols=["x", "y"],
        zorder_files=16,
    )
    keep_after, _ = zmod.prune_files(path, "y", lo=0, hi=7)
    total = zmod.count_data_files(path)
    assert len(keep_after) <= total // 2, (len(keep_after), total)
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert zmod.read_pruned(spark, path, "y", lo=0, hi=7).count() == back.filter(
        "y between 0 and 7"
    ).count()


def test_unknown_column_never_prunes(spark, tmp_path):
    """A column in NO footer at all (typo / case drift — Spark resolves
    filters case-insensitively, so the mismatch is invisible elsewhere)
    must stay unrecorded: every file kept, result == full scan."""
    path = str(tmp_path / "ds")
    _v1(spark, path)
    zm.build_zonemap(path, ["V", "nope"])  # wrong case + nonexistent
    total = zm.count_data_files(path)
    for col in ("V", "nope"):
        keep, _ = zm.prune_files(path, col, lo=0.0, hi=1.0)
        assert len(keep) == total, col
    bs.build_bloom_index(path, ["V"], spark=spark)
    keep, _ = bs.prune_files_eq(path, "V", [0.5])
    assert len(keep) == total


def test_sidecar_predating_evolution_backfills_on_update(spark, tmp_path):
    """The standard streaming flow: sidecars exist BEFORE the evolution.
    The incremental update must footer-rescan covered pre-evolution
    files once and record their gaps — whole-history pruning may not
    silently depend on a full rebuild."""
    path = str(tmp_path / "ds")
    _v1(spark, path)
    zm.build_zonemap(path, ["id"])
    bs.build_bloom_index(path, ["id"], spark=spark)
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    zm.update_zonemap(path, ["score"])
    bs.update_bloom_index(path, ["score"], spark=spark)
    total = zm.count_data_files(path)
    keep_z, _ = zm.prune_files(path, "score", lo=100.0, hi=120.0)
    assert keep_z and len(keep_z) < total
    keep_b, _ = bs.prune_files_eq(path, "score", [105.0])
    assert keep_b and len(keep_b) < total
    # the pre-evolution gap entries are O(1)-byte markers, not full
    # all-zero bitmaps (1M-file datasets must not grow by GBs per column)
    blooms = bs.load_bloom_index(path)
    gaps = [
        enc
        for fb in blooms.values()
        for c, enc in fb.items()
        if c == "score" and enc.get("empty")
    ]
    assert gaps and all("bits" not in enc for enc in gaps)
    # and the update is idempotent: a second call rewrites nothing new
    again = bs.update_bloom_index(path, ["score"], spark=spark)
    assert again == blooms


def test_snapshots_preserve_evolution_state(spark, tmp_path):
    """Time travel across a schema evolution: the pre-evolution pin
    serves the OLD schema, the post-evolution pin serves the union
    (merged read), and the increment between them reads only the
    evolved slice — evolution is pinned, never retro-normalized."""
    from big_data_engineering_financial_analysis_spark.sources import snapshots as sn

    path = str(tmp_path / "ds")
    _v1(spark, path)
    v1 = sn.commit_snapshot(path, note="pre-evolution")
    append_evolved(_v2(spark), path, partition_cols=["lang"], sort_cols=["id"])
    v2 = sn.commit_snapshot(path, note="post-evolution")

    old = sn.read_snapshot(spark, path, v1)
    assert set(old.columns) == {"id", "v", "lang"}  # no 'score' yet
    assert old.count() == 40

    new = sn.read_snapshot(spark, path, v2, merge_schema=True)
    assert set(new.columns) == {"id", "v", "lang", "score"}
    assert new.count() == 70
    assert new.filter("id < 100 AND score IS NOT NULL").count() == 0

    inc = sn.read_snapshot_increment(spark, path, v1, v2, merge_schema=True)
    assert inc.count() == 30
    assert inc.filter("score IS NULL").count() == 0


def test_compaction_promotes_column_types(spark, tmp_path):
    """The sanctioned widening path: producers outgrew the dataset's int
    id, align refuses the lossy direction, compaction promotes the
    DATASET, and the formerly-refused append then lands cleanly."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import compact_dataset

    path = str(tmp_path / "ds")
    narrow = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(20)],
        schema=T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    write_sharded(narrow, path, partition_cols=["lang"], sort_cols=["id"])
    wide = spark.createDataFrame(
        [(10**12, "en")],
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    with pytest.raises(TypeError, match="id"):
        align_to_dataset(wide, dataset_schema(spark, path))
    # lossy promotion is refused outright
    with pytest.raises(TypeError, match="lossless"):
        compact_dataset(
            spark, path, ["lang"], ["id"], cast_cols={"id": "short"}
        )
    compact_dataset(spark, path, ["lang"], ["id"], cast_cols={"id": "long"})
    append_evolved(wide, path, partition_cols=["lang"], sort_cols=["id"])
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["id"] == "bigint"
    assert back.count() == 21
    assert back.filter(F.col("id") == 10**12).count() == 1


def test_repartition_via_compaction(spark, tmp_path):
    """Changing the PARTITION scheme is just compaction with different
    partition_cols: the rewrite re-lays the directories and rebuilds
    both sidecars on the staged tree atomically with the swap."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import compact_dataset

    path = str(tmp_path / "ds")
    _v1(spark, path)  # partitioned on lang
    zm.build_zonemap(path, ["id"])
    bs.build_bloom_index(path, ["id"], spark=spark)
    # flat -> no more lang= dirs; sidecars must still skip afterwards
    compact_dataset(spark, path, partition_cols=[], sort_cols=["id"])
    import os

    assert not any(d.startswith("lang=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == 40 and "lang" in back.columns
    # the rebuilt zones cover the new files: an out-of-range band is
    # provably empty (the flat 2-file layout interleaves ids, so an
    # in-range band can't demonstrate skipping here)
    keep, _ = zm.prune_files(path, "id", lo=100, hi=200)
    assert keep == []
    got = bs.read_point(spark, path, "id", [7]).collect()
    assert len(got) == 1 and got[0]["lang"] == "en"


def test_zorder_write_on_evolved_column_prunes_pre_evolution_files(
    spark, tmp_path
):
    """K12 x K13 composition (r9 verdict ask #7): a dataset evolves a new
    column, then a Z-order APPEND clusters on a key set that includes it.
    The zonemap refresh must (a) keep the standing coverage of the old
    keys, and (b) record the known-column evolution gap for pre-evolution
    files — so a range predicate on the NEW column skips the whole
    pre-evolution generation and still returns exactly the full-scan
    answer."""
    from pyspark.sql import Row

    from big_data_engineering_financial_analysis_spark.operators.layout import (
        write_zordered,
    )

    path = str(tmp_path / "zevo")
    gen1 = spark.createDataFrame(
        [Row(x=i % 64, y=(i * 31) % 64, id=i) for i in range(1000)]
    )
    write_zordered(gen1, path, ["x", "y"], n_files=8, zonemap=True)
    pre_files = set(zm.load_zonemap(path))
    # evolution: gen-2 arrives with a new score column, and the layout
    # policy switches to clustering on (x, score)
    gen2 = spark.createDataFrame(
        [
            Row(x=i % 64, y=(i * 31) % 64, id=10_000 + i, score=float(i % 256))
            for i in range(1000)
        ]
    )
    write_zordered(
        gen2, path, ["x", "score"], n_files=8, mode="append", zonemap=True
    )
    manifest = zm.load_zonemap(path)
    # (a) standing coverage survives: every file still carries x and y
    assert all({"x", "y"} <= set(zones) for zones in manifest.values())
    # (b) pre-evolution files got the all-NULL gap zone for score
    assert all(manifest[rel].get("score") is None for rel in pre_files)
    # and the prune uses it: every pre-evolution file skips on a score
    # range, some post-evolution files skip too (they are z-clustered)
    keep, total = zm.prune_files(path, "score", lo=0.0, hi=31.0)
    assert not set(keep) & pre_files, "pre-evolution files must all skip"
    assert len(keep) < total - len(pre_files), "z-layout should skip more"
    got = zm.read_pruned(spark, path, "score", lo=0.0, hi=31.0)
    full = spark.read.option("mergeSchema", "true").parquet(path)
    assert got.count() == full.filter("score between 0.0 and 31.0").count()
