"""Z-order clustered writes: the multi-dimensional layout bounds EVERY
z-ordered column per file, so file-level skipping works on all of them
— where a linear sort serves only its leading column."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.layout import (
    BITS,
    write_zordered,
    zvalue,
    zvalue_n,
)
from big_data_engineering_financial_analysis_spark.sources import zonemap as zm


def _grid(spark, side: int = 64):
    """Uniform side x side integer grid — every (x, y) once."""
    return spark.createDataFrame(
        [Row(x=i, y=j, payload=i * side + j) for i in range(side) for j in range(side)]
    )


def test_zvalue_n_matches_2d_zvalue(spark):
    df = _grid(spark, 16).withColumn(
        "a", zvalue(F.col("x"), F.col("y"))
    ).withColumn("b", zvalue_n([F.col("x"), F.col("y")], BITS))
    assert df.filter("a <> b").count() == 0


def test_zordered_round_trip_exact(spark, tmp_path):
    df = _grid(spark)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert back.columns == df.columns
    assert (
        back.groupBy().agg(F.sum("payload")).first()[0]
        == df.groupBy().agg(F.sum("payload")).first()[0]
    )


def test_both_dimensions_prune_where_linear_sort_cannot(spark, tmp_path):
    df = _grid(spark)
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    # the linear strawman: sorted by x only, same file count
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)
    zm.build_zonemap(xpath, ["x", "y"])
    total_z = zm.count_data_files(zpath)
    total_x = zm.count_data_files(xpath)
    # a y-band covering ~1/8 of the y range
    keep_z, _ = zm.prune_files(zpath, "y", lo=0, hi=7)
    keep_x, _ = zm.prune_files(xpath, "y", lo=0, hi=7)
    assert len(keep_x) == total_x, "x-sorted files all span the full y range"
    assert len(keep_z) <= total_z // 2, (len(keep_z), total_z)
    # and the z layout still prunes on x too (both dims bounded)
    keep_zx, _ = zm.prune_files(zpath, "x", lo=0, hi=7)
    assert len(keep_zx) <= total_z // 2
    # result contract: pruned read == full scan + filter
    got = zm.read_pruned(spark, zpath, "y", lo=0, hi=7).count()
    assert got == df.filter("y between 0 and 7").count()


def test_quantile_codes_survive_skew_where_minmax_collapses(spark, tmp_path):
    """One huge outlier compresses every min-max code into bucket ~0;
    rank codes don't care.  The probed band covers the bulk's middle
    ~10%, so a working layout must skip most files on that dimension."""
    rows = [Row(x=i, y=float(i % 1000), id=i) for i in range(5000)]
    rows.append(Row(x=5000, y=1e12, id=-1))  # the outlier
    df = spark.createDataFrame(rows)
    qpath, mpath = str(tmp_path / "q"), str(tmp_path / "m")
    write_zordered(df, qpath, ["x", "y"], n_files=16, code_mode="quantile")
    write_zordered(df, mpath, ["x", "y"], n_files=16, code_mode="minmax")
    keep_q, _ = zm.prune_files(qpath, "y", lo=450.0, hi=549.0)
    keep_m, _ = zm.prune_files(mpath, "y", lo=450.0, hi=549.0)
    total_q = zm.count_data_files(qpath)
    assert len(keep_q) <= total_q // 2, (len(keep_q), total_q)
    assert len(keep_q) < len(keep_m)
    # result contract holds in both modes
    expect = df.filter("y between 450.0 and 549.0").count()
    assert zm.read_pruned(spark, qpath, "y", lo=450.0, hi=549.0).count() == expect
    assert zm.read_pruned(spark, mpath, "y", lo=450.0, hi=549.0).count() == expect


def test_three_dimensions_and_nulls(spark, tmp_path):
    rows = [
        Row(a=i % 50, b=(i * 7) % 50, c=(i * 13) % 50, id=i) for i in range(2000)
    ]
    rows.append(Row(a=None, b=None, c=None, id=-1))
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "z3")
    stats = write_zordered(df, path, ["a", "b", "c"], n_files=8)
    assert set(stats) == {"mode", "cols"}
    assert set(stats["cols"]) == {"a", "b", "c"}
    back = spark.read.parquet(path)
    assert back.count() == 2001
    assert back.filter("id = -1").count() == 1  # NULL row survives
    keep, _ = zm.prune_files(path, "c", lo=40, hi=49)
    assert len(keep) < zm.count_data_files(path)
    # 3 dims -> 20 bits each: key fits a positive long
    mx = df.na.drop().select(
        F.max(
            zvalue_n(
                [F.col("a").cast("long"), F.col("b").cast("long"), F.col("c").cast("long")],
                20,
            )
        )
    ).first()[0]
    assert 0 <= mx < (1 << 60)


def test_frozen_stats_append_shares_key_space(spark, tmp_path):
    df1 = _grid(spark, 32)
    df2 = _grid(spark, 32).withColumn("payload", F.col("payload") + 10000)
    path = str(tmp_path / "zi")
    stats = write_zordered(df1, path, ["x", "y"], n_files=8)
    stats2 = write_zordered(
        df2, path, ["x", "y"], n_files=8, mode="append", stats=stats
    )
    assert stats2 == stats  # frozen coding passes through unchanged
    zm.update_zonemap(path, ["x", "y"])
    total = zm.count_data_files(path)
    keep, _ = zm.prune_files(path, "y", lo=0, hi=3)
    # both generations' files are z-clustered in the SAME key space, so
    # the band prunes across the whole (appended) dataset
    assert len(keep) <= total // 2, (len(keep), total)
    assert zm.read_pruned(spark, path, "y", lo=0, hi=3).count() == 2 * 32 * 4


def test_partitioned_zorder_write(spark, tmp_path):
    df = _grid(spark, 32).withColumn(
        "lang", F.when(F.col("x") % 2 == 0, "en").otherwise("de")
    )
    path = str(tmp_path / "zp")
    write_zordered(df, path, ["x", "y"], n_files=8, partition_cols=["lang"])
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("lang=")
    ) == ["lang=de", "lang=en"]
    back = spark.read.parquet(path)
    assert back.count() == 32 * 32
    # within-partition files are z-clustered: a y-band prunes
    keep, _ = zm.prune_files(path, "y", lo=0, hi=3)
    assert len(keep) < zm.count_data_files(path)


def test_append_zonemap_keeps_standing_coverage(spark, tmp_path):
    """Advice r9: write_zordered(zonemap=True) must UNION its key set
    with the standing manifest's columns — a re-layout/append used to
    rebuild the manifest over zorder_cols only, silently dropping other
    columns' coverage (a pruning regression, not a correctness break)."""
    df1 = _grid(spark, 32)
    path = str(tmp_path / "zc")
    stats = write_zordered(df1, path, ["x", "y"], n_files=8, zonemap=True)
    # the operator widened the standing coverage to payload as well
    zm.update_zonemap(path, ["payload"])
    covered = {c for zones in zm.load_zonemap(path).values() for c in zones}
    assert {"x", "y", "payload"} <= covered

    df2 = _grid(spark, 32).withColumn("payload", F.col("payload") + 10000)
    write_zordered(
        df2, path, ["x", "y"], n_files=8, mode="append", stats=stats,
        zonemap=True,
    )
    manifest = zm.load_zonemap(path)
    covered_after = {c for zones in manifest.values() for c in zones}
    assert "payload" in covered_after, sorted(covered_after)
    # every file (old and new generation) carries the payload zone
    assert all("payload" in zones for zones in manifest.values())
