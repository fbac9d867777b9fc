"""Partition-sharded Bloom manifests — the 1M-file regime answer.

A single root JSON at ~10.8 KB/file is a ~10 GB driver-side load at
lake scale, paid on every prune.  The sharded layout bounds BOTH the
bytes on any one manifest file and the bytes a prune loads: one shard
per Hive partition directory, partition-value pruning (zero IO) before
any shard is opened, and the root reduced to a marker + root-level
files.  Every test here holds the module's one invariant fixed: the
pruned result ALWAYS equals full scan + filter.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded


def _rows(n=300):
    return [
        {
            "doc_id": (i * 37) % n,
            "lang": ["en", "de", "fr"][i % 3],
            "score": float(i % 100),
        }
        for i in range(n)
    ]


def _write(spark, path):
    df = spark.createDataFrame(_rows())
    write_sharded(
        df, path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=40,
    )
    return df


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_partitioned_build_writes_shards_and_root_marker(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    with open(os.path.join(path, bs.MANIFEST_NAME)) as fh:
        root = json.load(fh)
    assert root["format"] == bs.KEY_FORMAT and root["sharded"] is True
    assert root["files"] == {}  # no root-level data files
    for lang in ("en", "de", "fr"):
        shard_fp = os.path.join(path, f"lang={lang}", bs.MANIFEST_NAME)
        assert os.path.isfile(shard_fp)
        with open(shard_fp) as fh:
            shard = json.load(fh)
        assert shard["format"] == bs.KEY_FORMAT
        assert all(os.sep not in k for k in shard["files"])  # basename keys
    # the merged view is unchanged: rel-keyed, every data file covered
    full = bs.load_bloom_index(path)
    assert set(full) == {
        os.path.relpath(f, path) for f in bs._data_files(path)
    }
    # and the root manifest is now O(1), not O(files)
    assert os.path.getsize(os.path.join(path, bs.MANIFEST_NAME)) < 200


def test_unpartitioned_dataset_keeps_single_manifest(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.createDataFrame(_rows()).repartition(4).write.parquet(path)
    bs.build_bloom_index(path, ["doc_id"])
    with open(os.path.join(path, bs.MANIFEST_NAME)) as fh:
        root = json.load(fh)
    assert "sharded" not in root
    assert set(root["files"]) == {
        os.path.relpath(f, path) for f in bs._data_files(path)
    }
    got = bs.read_point(spark, path, "doc_id", [3])
    assert _ids(got) == [3]


def test_partition_eq_prunes_without_opening_other_shards(
    spark, tmp_path, monkeypatch
):
    """An equality predicate on the partition column must (a) never open
    the shard manifests of pruned-away partitions and (b) still produce
    full-scan-equal results — even when a pruned partition's shard is
    GARBAGE on disk, proving it was neither read nor needed."""
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # corrupt the shards of the partitions the predicate excludes
    for lang in ("de", "fr"):
        with open(os.path.join(path, f"lang={lang}", bs.MANIFEST_NAME), "w") as fh:
            fh.write("NOT JSON")

    opened: list[str] = []
    real = bs._shard_files

    def spy(p, d, format_gated):
        opened.append(d)
        return real(p, d, format_gated)

    monkeypatch.setattr(bs, "_shard_files", spy)
    probe = sorted({r["doc_id"] for r in _rows() if r["lang"] == "en"})[:3]
    keep, total = bs.prune_files_combined(
        path, eq=[("lang", ["en"]), ("doc_id", probe)]
    )
    assert opened == ["lang=en"]
    assert all("lang=en" in f for f in keep) and len(keep) < total
    got = bs.read_skipped(spark, path, eq=[("lang", ["en"]), ("doc_id", probe)])
    expect = df.filter(F.col("lang") == "en").filter(F.col("doc_id").isin(probe))
    assert _ids(got) == _ids(expect)


def test_partition_eq_cross_type_never_skips_matching_rows(spark, tmp_path):
    """Partition values are directory STRINGS; probes arrive typed.  An
    int probe against an int-valued partition directory must keep that
    partition (same _key_bytes canonicalization as the Bloom probes)."""
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [{"k": i % 4, "v": i} for i in range(100)]
    )
    write_sharded(df, path, partition_cols=["k"], sort_cols=["v"])
    bs.build_bloom_index(path, ["v"])
    got = bs.read_skipped(spark, path, eq=[("k", [2])])
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in df.filter("k = 2").collect()
    )
    # and a provably-absent partition value skips everything without IO:
    # since round 8 the failing partitions are pruned during the WALK, so
    # nothing is even enumerated (total counts files CONSIDERED, and a
    # probe that kills every partition considers none)
    keep, total = bs.prune_files_combined(path, eq=[("k", [99])])
    assert keep == [] and total == 0


def test_null_partition_skippable_for_eq_kept_for_no_predicate(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None)], "doc_id long, lang string"
    )
    df.write.partitionBy("lang").parquet(path)
    bs.build_bloom_index(path, ["doc_id"])
    # equality can never match the NULL partition: its files are pruned
    keep, _ = bs.prune_files_combined(path, eq=[("lang", ["en"])])
    assert all("__HIVE_DEFAULT_PARTITION__" not in f for f in keep)
    got = bs.read_skipped(spark, path, eq=[("lang", ["en"])])
    assert _ids(got) == [1]
    # a range bound excludes NULL too (NULL comparison is never true)
    keep_r, _ = bs.prune_files_combined(path, ranges=[("lang", "a", "zz")])
    assert all("__HIVE_DEFAULT_PARTITION__" not in f for f in keep_r)
    # no predicate on the partition column: NULL-partition files scan
    got_all = bs.read_skipped(spark, path, eq=[("doc_id", [2])])
    assert _ids(got_all) == [2]


def test_range_partition_pruning_is_type_conservative():
    """A partition string may be read by Spark as string OR number — the
    directory name alone doesn't say.  Skipping is only allowed when
    every feasible interpretation proves the range empty."""
    # "9" >= "10" lexicographically, 9 < 10 numerically: AMBIGUOUS -> keep
    assert bs._range_maybe_matches("9", "10", None)
    # int bounds admit only the numeric interpretation: provably empty
    assert not bs._range_maybe_matches("9", 10, None)
    assert bs._range_maybe_matches("15", 10, 20)
    assert not bs._range_maybe_matches("25", 10, 20)
    # temporal interpretation (date bounds vs ISO directory value)
    import datetime as dt

    assert bs._range_maybe_matches(
        "2024-01-05", dt.date(2024, 1, 1), dt.date(2024, 1, 31)
    )
    assert not bs._range_maybe_matches(
        "2024-02-05", dt.date(2024, 1, 1), dt.date(2024, 1, 31)
    )
    # unparseable-for-every-interpretation: keep
    assert bs._range_maybe_matches("abc", 1, 2)


def test_update_preserves_sharded_layout_and_appends(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # append one more partition's worth of rows
    extra = spark.createDataFrame(
        [{"doc_id": 9001, "lang": "it", "score": 1.0}]
    )
    extra.write.mode("append").partitionBy("lang").parquet(path)
    bs.update_bloom_index(path)
    with open(os.path.join(path, bs.MANIFEST_NAME)) as fh:
        assert json.load(fh)["sharded"] is True
    assert os.path.isfile(os.path.join(path, "lang=it", bs.MANIFEST_NAME))
    keep, total = bs.prune_files_eq(path, "doc_id", [9001])
    assert len(keep) == 1 and total > 3
    assert _ids(bs.read_point(spark, path, "doc_id", [9001])) == [9001]


def test_snapshot_carries_partition_shards(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources import snapshots as sn

    path = str(tmp_path / "ds")
    df = _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    v = sn.commit_snapshot(path)
    vdir = os.path.join(sn._snap_root(path), f"v{v:08d}")
    keep, total = bs.prune_files_eq(vdir, "doc_id", [7])
    assert len(keep) < total
    got = bs.read_point(spark, vdir, "doc_id", [7])
    assert _ids(got) == _ids(df.filter("doc_id = 7"))


def test_dirs_update_heals_stale_format_root(spark, tmp_path):
    """A sharded root written under an older KEY_FORMAT must force the
    FULL update even when dirs= is passed — the dirs branch never
    rewrites the root, so engaging it would rebuild shards forever
    under a root that load/prune refuse (index silently dead)."""
    path = str(tmp_path / "ds")
    df = spark.createDataFrame([{"k": str(i % 3), "v": i} for i in range(60)])
    write_sharded(df, path, partition_cols=["k"], sort_cols=["v"])
    bs.build_bloom_index(path, ["v"])
    # age the root's format tag
    root_fp = os.path.join(path, bs.MANIFEST_NAME)
    obj = json.load(open(root_fp))
    obj["format"] = bs.KEY_FORMAT - 1
    json.dump(obj, open(root_fp, "w"))
    assert bs.load_bloom_index(path) is None  # stale root: index dead
    bs.update_bloom_index(path, ["v"], dirs=["k=1"])
    # the full path ran: root healed at the current format, index alive
    healed = json.load(open(root_fp))
    assert healed["format"] == bs.KEY_FORMAT
    blooms = bs.load_bloom_index(path)
    rels = sorted(os.path.relpath(f, path) for f in bs._data_files(path))
    assert blooms is not None and sorted(blooms) == rels


def test_streaming_build_matches_inmemory_build(spark, tmp_path, monkeypatch):
    """r10: above BUILD_STREAM_BYTES the distributed build streams one
    leaf at a time (toLocalIterator + per-leaf shard writes) instead of
    one dataset-sized collect.  The on-disk result must be IDENTICAL to
    the in-memory build — shard for shard, filter for filter — and the
    summary return must count every file and leaf."""
    b = str(tmp_path / "stream")
    _write(spark, b)
    bs.build_bloom_index(b, ["doc_id"], spark=spark)
    mem = bs.load_bloom_index(b)
    keep_mem, _ = bs.prune_files_eq(b, "doc_id", [7])
    monkeypatch.setattr(bs, "BUILD_STREAM_BYTES", 0)
    out = bs.build_bloom_index(b, ["doc_id"], spark=spark)
    n_files = len(bs._data_files(b))
    assert out == {"streamed": True, "files": n_files, "leaves": 3}
    stream = bs.load_bloom_index(b)
    assert mem == stream  # same rels, same (m, k, bits) everywhere
    # prunes behave identically, root marker is O(1)
    keep, total = bs.prune_files_eq(b, "doc_id", [7])
    assert sorted(keep) == sorted(keep_mem) and len(keep) < total
    assert os.path.getsize(os.path.join(b, bs.MANIFEST_NAME)) < 200


def test_streaming_build_evolution_gap_and_nested_dirs(spark, tmp_path, monkeypatch):
    """Streaming build corner cases: (a) the global known-column pass
    runs BEFORE any shard is written, so a column absent from a whole
    partition's footers still gets its O(1) gap markers there; (b) a
    parent dir holding its own files around a nested child dir flushes
    each shard exactly once (the (dir, base) sort)."""
    from pyspark.sql import Row

    path = str(tmp_path / "evo")
    # gen-1: lang=de files lack `score` entirely
    spark.createDataFrame([Row(doc_id=i, lang="de") for i in range(20)]) \
        .coalesce(2).write.parquet(os.path.join(path, "lang=de"))
    spark.createDataFrame(
        [Row(doc_id=100 + i, score=float(i), lang="en") for i in range(20)]
    ).coalesce(2).write.parquet(os.path.join(path, "lang=en"))
    # nested child inside a dir that also holds files directly
    spark.createDataFrame(
        [Row(doc_id=200 + i, score=1.0, lang="en") for i in range(4)]
    ).coalesce(1).write.parquet(os.path.join(path, "lang=en", "sub=x"))
    monkeypatch.setattr(bs, "BUILD_STREAM_BYTES", 0)
    out = bs.build_bloom_index(path, ["doc_id", "score"], spark=spark)
    assert out["streamed"] and out["files"] == len(bs._data_files(path))
    full = bs.load_bloom_index(path)
    assert set(full) == {os.path.relpath(f, path) for f in bs._data_files(path)}
    # (a) every de file carries the O(1) empty gap marker for score
    de = {rel: b for rel, b in full.items() if rel.startswith("lang=de")}
    assert de and all(b["score"].get("empty") is True for b in de.values())
    # (b) the parent shard kept ALL its own files despite the nested child
    en_parent = {
        rel for rel in full if rel.startswith("lang=en") and "sub=x" not in rel
    }
    assert len(en_parent) == 2
    # point lookups work across generations
    keep, total = bs.prune_files_eq(path, "score", [3.0])
    assert 0 < len(keep) < total


def test_full_update_degrades_to_streaming_rebuild(spark, tmp_path, monkeypatch):
    """r10 review: the full-update branch (no dirs=) must not funnel a
    huge uncovered set through _update_scan's single collect — above the
    threshold on a partitioned dataset it degrades to the streaming
    rebuild, preserving observed sizing."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    big = bs.DEFAULT_N_BITS * 2
    bs.build_bloom_index(path, ["doc_id"], n_bits=big, spark=spark)
    # append more files, then force the streaming threshold to zero
    _write2 = spark.createDataFrame(_rows()).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

    write_sharded(
        _write2, path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=40, mode="append",
    )
    monkeypatch.setattr(bs, "BUILD_STREAM_BYTES", 0)
    out = bs.update_bloom_index(path, ["doc_id"], spark=spark)
    assert out.get("streamed") is True
    full = bs.load_bloom_index(path)
    assert set(full) == {os.path.relpath(f, path) for f in bs._data_files(path)}
    # observed upsizing survived the degraded rebuild
    assert all(b["doc_id"]["m"] == big for b in full.values())
    keep, total = bs.prune_files_eq(path, "doc_id", [1007])
    assert 0 < len(keep) < total

def test_streaming_build_honors_known_extra(spark, tmp_path):
    """Advice r10 (helper level): _build_blooms_streaming must widen its
    footer-name union with caller-known columns — update_bloom_index's
    streaming degrade passes the old manifest's real-filter columns.
    With a known_extra column absent from EVERY current footer, each
    file gets that column's evolution-gap marker; without it, none
    would (the footer pass alone cannot justify the column)."""
    from pyspark.sql import Row

    path = str(tmp_path / "ds")
    spark.createDataFrame(
        [Row(doc_id=i, lang="de") for i in range(20)]
    ).coalesce(2).write.parquet(os.path.join(path, "lang=de"))
    pairs = sorted(
        ((os.path.relpath(f, path), f) for f in bs._data_files(path)),
        key=lambda rf: os.path.split(rf[0]),
    )
    sizing = {"doc_id": (bs.DEFAULT_N_BITS, bs.DEFAULT_N_HASHES),
              "score": (bs.DEFAULT_N_BITS, bs.DEFAULT_N_HASHES)}
    out = bs._build_blooms_streaming(
        path, pairs, sizing, spark, known_extra={"score"}
    )
    assert out["streamed"] is True
    full = bs.load_bloom_index(path)
    assert full and all(b["score"].get("empty") is True for b in full.values())
    assert all(not b["doc_id"].get("empty") for b in full.values())


def test_streaming_degrade_known_gate_matches_inmemory_update(
    spark, tmp_path, monkeypatch
):
    """Advice r10 (end-to-end): when a mass append of score-less files
    hits a manifest whose covered files carry REAL score filters, the
    in-memory update justifies score gap markers on the new files via
    `known |= _known_bloom_cols(manifest)` (covered footers are never
    rescanned).  The streaming degrade must produce the same shape —
    via the threaded known_extra plus its global footer pass."""
    from pyspark.sql import Row

    def build_state(path):
        spark.createDataFrame(
            [Row(doc_id=100 + i, score=float(i), lang="en") for i in range(20)]
        ).coalesce(2).write.parquet(os.path.join(path, "lang=en"))
        bs.build_bloom_index(path, ["doc_id", "score"], spark=spark)
        # mass append: a new partition whose files never had score
        spark.createDataFrame(
            [Row(doc_id=200 + i, lang="fr") for i in range(20)]
        ).coalesce(2).write.parquet(os.path.join(path, "lang=fr"))

    def shape(path):
        return sorted(
            (
                os.path.dirname(rel),
                sorted(
                    (c, e.get("m"), e.get("k"), e.get("empty", False))
                    for c, e in bl.items()
                ),
            )
            for rel, bl in bs.load_bloom_index(path).items()
        )

    a, b = str(tmp_path / "mem"), str(tmp_path / "stream")
    build_state(a)
    build_state(b)
    bs.update_bloom_index(a, ["doc_id", "score"], spark=spark)
    monkeypatch.setattr(bs, "BUILD_STREAM_BYTES", 0)
    out = bs.update_bloom_index(b, ["doc_id", "score"], spark=spark)
    assert out.get("streamed") is True
    # same per-directory shape modulo the trees' distinct parquet names:
    # fr files carry the score gap marker on BOTH paths, en files carry
    # real filters on both
    assert shape(a) == shape(b)
    fr = {rel: bl for rel, bl in bs.load_bloom_index(b).items()
          if rel.startswith("lang=fr")}
    assert fr and all(bl["score"].get("empty") is True for bl in fr.values())
