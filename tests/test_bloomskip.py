"""Bloom-sidecar file skipping: result always equals full-scan + filter
(no false negatives, ever), and the sidecar actually skips files for
point lookups where zone maps cannot."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded


def _rows(n=400):
    # doc_id deliberately NOT clustered: round-robin across shards, so
    # every file's [min, max] doc_id zone covers every probe -> zone maps
    # are useless here and blooms are the only skipping signal.
    return [
        {
            "doc_id": (i * 37) % n,
            "lang": "en" if i % 4 else "de",
            "title": f"doc-{(i * 37) % n}",
            "score": float(i % 100),
        }
        for i in range(n)
    ]


def _write(spark, path):
    df = spark.createDataFrame(_rows())
    write_sharded(
        df, path, partition_cols=["lang"], sort_cols=["score"],
        max_records_per_file=50,
    )
    return df


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_point_read_equals_filter_and_skips_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id", "title"])

    probe = [3, 77, 151]
    keep, total = bs.prune_files_eq(path, "doc_id", probe)
    assert total > 4
    assert len(keep) < total  # blooms skip files zone maps could not

    got = bs.read_point(spark, path, "doc_id", probe)
    exp = spark.read.parquet(path).filter(F.col("doc_id").isin(probe))
    assert _ids(got) == _ids(exp)
    assert set(got.columns) == set(exp.columns)  # partition col recovered

    # string key path
    got_t = bs.read_point(spark, path, "title", ["doc-3"])
    exp_t = spark.read.parquet(path).filter(F.col("title") == "doc-3")
    assert _ids(got_t) == _ids(exp_t) == [3]


def test_absent_value_skips_everything(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    keep, total = bs.prune_files_eq(path, "doc_id", [10_000_001])
    # overwhelmingly likely all files are proven free of one absent key
    # at 2^16 bits for <=100 keys/file; equality of results is the real
    # contract and holds regardless
    assert len(keep) < total
    assert bs.read_point(spark, path, "doc_id", [10_000_001]).count() == 0


def test_empty_values_and_unknown_column_are_safe(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    assert bs.read_point(spark, path, "doc_id", []).count() == 0
    # unindexed column: every file kept, result still exact
    got = bs.read_point(spark, path, "score", [7.0])
    exp = spark.read.parquet(path).filter(F.col("score") == 7.0)
    assert got.count() == exp.count() > 0


def test_appended_file_without_manifest_entry_is_kept(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # append new rows AFTER the build — manifest doesn't know the file
    extra = spark.createDataFrame(
        [{"doc_id": 9999, "lang": "en", "title": "doc-9999", "score": 1.0}]
    )
    extra.write.mode("append").partitionBy("lang").parquet(path)
    got = bs.read_point(spark, path, "doc_id", [9999])
    assert _ids(got) == [9999]  # safety: unknown file scanned

    # incremental update covers it and keeps results identical
    bs.update_bloom_index(path)
    man = bs.load_bloom_index(path)
    assert all("doc_id" in blooms or blooms == {} for blooms in man.values())
    assert _ids(bs.read_point(spark, path, "doc_id", [9999])) == [9999]


def test_update_drops_deleted_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    man0 = bs.load_bloom_index(path)
    victim = sorted(man0)[0]
    os.remove(os.path.join(path, victim))
    bs.update_bloom_index(path)
    man1 = bs.load_bloom_index(path)
    assert victim not in man1
    assert set(man1) == set(man0) - {victim}


def test_nulls_never_match_equality(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "doc_id long, title string"
    )
    df.repartition(1).write.parquet(path)
    bs.build_bloom_index(path, ["title"])
    got = bs.read_point(spark, path, "title", ["a"])
    exp = spark.read.parquet(path).filter(F.col("title") == "a")
    assert got.count() == exp.count() == 1


def test_missing_manifest_degrades_to_full_scan(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    # no build at all
    got = bs.read_point(spark, path, "doc_id", [3])
    exp = spark.read.parquet(path).filter(F.col("doc_id") == 3)
    assert _ids(got) == _ids(exp) == [3]


def test_capped_bits_stay_correct_just_less_selective(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"], n_bits=64, n_hashes=2)  # absurdly small
    got = bs.read_point(spark, path, "doc_id", [3, 77])
    exp = spark.read.parquet(path).filter(F.col("doc_id").isin([3, 77]))
    assert _ids(got) == _ids(exp)


@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(
        st.one_of(st.integers(-(2**40), 2**40), st.text(max_size=12)),
        min_size=1,
        max_size=50,
    ),
    probe_extra=st.lists(st.integers(), max_size=5),
)
def test_bloom_has_no_false_negatives(keys, probe_extra):
    bloom = bs._Bloom(1 << 10, 5)
    for k in keys:
        bloom.add(k)
    for k in keys:
        assert bloom.might_contain(k)
    # decode(encode) round-trips membership
    again = bs._Bloom.decode(bloom.encode())
    for k in keys + probe_extra:
        assert again.might_contain(k) == bloom.might_contain(k)


def test_canonical_key_bytes_cross_type():
    import datetime as dt

    import numpy as np

    assert bs._key_bytes(np.int32(5)) == bs._key_bytes(5)
    assert bs._key_bytes(np.int64(5)) == bs._key_bytes(5)
    assert bs._key_bytes(True) != bs._key_bytes(1)
    aware = dt.datetime(2024, 1, 5, 12, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 5, 12, 0)
    assert bs._key_bytes(aware) == bs._key_bytes(naive)


def test_canonical_key_bytes_cross_numeric_type():
    """Spark's isin casts across numeric/string types (isin(42) matches a
    double column's 42.0), so numerically-equal values of any carrier type
    must hash identically — a type-mismatched probe can't false-negative."""
    import decimal

    import numpy as np

    # integral magnitudes collapse across every carrier
    forty_two = [42, 42.0, np.float64(42.0), decimal.Decimal("42"), "42", "42.0"]
    assert len({bs._key_bytes(v) for v in forty_two}) == 1
    # fractional magnitudes collapse across float / Decimal / string
    half = [42.5, np.float64(42.5), decimal.Decimal("42.5"), "42.5"]
    assert len({bs._key_bytes(v) for v in half}) == 1
    # distinct magnitudes stay distinct
    assert bs._key_bytes(42) != bs._key_bytes(42.5)
    assert bs._key_bytes(42) != bs._key_bytes(43)
    # non-numeric strings keep the string path
    assert bs._key_bytes("doc-42") != bs._key_bytes(42)
    # nan/inf don't crash and are self-consistent
    for weird in (float("nan"), float("inf"), decimal.Decimal("NaN")):
        assert bs._key_bytes(weird) == bs._key_bytes(weird)


def test_nonintegral_numpy_float_probe_does_not_truncate():
    """np.float32 / np.float16 are NOT Python-float subclasses, but int()
    succeeds on them — a truncating integer branch would canonicalize
    np.float32(42.5) to b"i:42" while the build side stored b"f:42.5":
    a Bloom FALSE NEGATIVE (file wrongly pruned, silent wrong results).
    The integer branch must accept only true integers (operator.index)."""
    import numpy as np

    # non-integral numpy floats of every width hash like the exact float
    for carrier in (np.float16, np.float32, np.float64):
        v = carrier(42.5)
        assert bs._key_bytes(v) == bs._key_bytes(float(v))
        assert bs._key_bytes(v) != bs._key_bytes(42)
    # a float32 value inexact in binary widens exactly as the build side
    # (pyarrow to_pylist widens float32 -> Python float the same way)
    v = np.float32(0.1)
    assert bs._key_bytes(v) == bs._key_bytes(float(v))
    # integral numpy floats still collapse to the int form via the
    # float branch's is_integer() check
    assert bs._key_bytes(np.float32(42.0)) == bs._key_bytes(42)
    # numpy integers keep taking the integer branch (__index__)
    assert bs._key_bytes(np.int16(7)) == bs._key_bytes(7)


def test_canonical_key_bytes_cross_temporal_type():
    """Spark's cast-and-compare matches a DATE row against a datetime
    probe (and vice versa), and casts ISO strings to timestamps — so all
    carriers of the same instant must hash identically."""
    import datetime as dt

    midnight = [
        dt.date(2024, 1, 5),
        dt.datetime(2024, 1, 5),
        dt.datetime(2024, 1, 5, tzinfo=dt.timezone.utc),
        "2024-01-05",
        "2024-01-05 00:00:00",
        "2024-01-05T00:00:00",
    ]
    assert len({bs._key_bytes(v) for v in midnight}) == 1
    noon = [
        dt.datetime(2024, 1, 5, 12, 0),
        "2024-01-05 12:00:00",
        dt.datetime(2024, 1, 5, 14, 0, tzinfo=dt.timezone(dt.timedelta(hours=2))),
    ]
    assert len({bs._key_bytes(v) for v in noon}) == 1
    assert bs._key_bytes(noon[0]) != bs._key_bytes(midnight[0])
    # non-temporal strings keep their own paths
    assert bs._key_bytes("12:00:00") == b"s:12:00:00"


def test_point_read_date_probe_on_timestamp_column(spark, tmp_path):
    """End-to-end regression for the temporal false negative: probing a
    TIMESTAMP column with a datetime.date must return exactly what
    full-scan + isin returns (Spark matches midnight rows by cast)."""
    import datetime as dt

    from pyspark.sql import functions as F2

    path = str(tmp_path / "ts_ds")
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 20), f"sym{i % 5}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, sym string")
    write_sharded(df, path, partition_cols=["sym"], sort_cols=["doc_id"],
                  max_records_per_file=20)
    bs.build_bloom_index(path, ["ts"])
    probe = dt.date(2024, 1, 5)
    got = bs.read_point(spark, path, "ts", [probe])
    exp = spark.read.parquet(path).filter(F2.col("ts").isin([probe]))
    got_ids = sorted(r.doc_id for r in got.collect())
    exp_ids = sorted(r.doc_id for r in exp.collect())
    assert got_ids == exp_ids and len(exp_ids) > 0


def test_distributed_build_matches_sequential(spark, tmp_path):
    """`build_bloom_index(spark=...)` fans the per-file column scans out
    over executors; the resulting manifest must be byte-identical to the
    driver-sequential build (filters are deterministic functions of file
    contents), and update_bloom_index(spark=...) must fill gaps the same
    way."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    seq = bs.build_bloom_index(path, ["doc_id", "title"])
    dist = bs.build_bloom_index(path, ["doc_id", "title"], spark=spark)
    assert dist == seq and len(dist) > 4

    # drop half the entries, re-fill distributed: identical again
    partial = {rel: b for i, (rel, b) in enumerate(sorted(seq.items())) if i % 2}
    bs._write_manifest(path, partial)
    refilled = bs.update_bloom_index(path, ["doc_id", "title"], spark=spark)
    assert refilled == seq

    got = bs.read_point(spark, path, "doc_id", [3, 77])
    exp = spark.read.parquet(path).filter(F.col("doc_id").isin([3, 77]))
    assert _ids(got) == _ids(exp)


def test_stale_format_manifest_degrades_to_full_scan(spark, tmp_path):
    """A sidecar written under an older _key_bytes canonicalization (or a
    legacy untagged manifest) must be treated as absent — full scan,
    never a probe against wrong bit positions — and the next update
    rewrites it at the current format."""
    import json

    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    manifest_file = os.path.join(path, bs.MANIFEST_NAME)
    with open(manifest_file) as fh:
        current = json.load(fh)
    assert current["format"] == bs.KEY_FORMAT
    full = bs.load_bloom_index(path)  # merged across partition shards
    assert full

    # legacy untagged shape (the raw rel-keyed files map, as pre-format
    # code wrote it at the root).  The partition shard manifests from the
    # build above are still on disk and still valid — a stale ROOT alone
    # must disable the whole index (shards are only reachable through a
    # format-matching root marker).
    with open(manifest_file, "w") as fh:
        json.dump(full, fh)
    assert bs.load_bloom_index(path) is None
    keep, total = bs.prune_files_eq(path, "doc_id", [3])
    assert len(keep) == total  # nothing pruned on a stale manifest
    got = bs.read_point(spark, path, "doc_id", [3])
    assert _ids(got) == [3]

    # wrong format number: same degradation, and update rewrites fresh
    with open(manifest_file, "w") as fh:
        json.dump({"format": bs.KEY_FORMAT - 1, "files": full}, fh)
    assert bs.load_bloom_index(path) is None
    rebuilt = bs.update_bloom_index(path, ["doc_id"])
    assert rebuilt == full
    keep2, total2 = bs.prune_files_eq(path, "doc_id", [3])
    assert len(keep2) < total2

    # malformed-but-tagged manifest degrades, never raises
    with open(manifest_file, "w") as fh:
        json.dump({"format": bs.KEY_FORMAT}, fh)
    assert bs.load_bloom_index(path) is None
    assert _ids(bs.read_point(spark, path, "doc_id", [3])) == [3]


def test_format_bump_rebuild_keeps_upsized_sizing(spark, tmp_path):
    """Per-column (m, k) is hash-scheme independent: when a legacy-format
    manifest forces a full rebuild, the upsized hot column must come back
    at its upsized (m, k), not the defaults."""
    import json

    path = str(tmp_path / "ds")
    _write(spark, path)
    big = bs.DEFAULT_N_BITS * 4
    bs.build_bloom_index(path, ["doc_id"], n_bits=big, n_hashes=9)
    manifest_file = os.path.join(path, bs.MANIFEST_NAME)
    with open(manifest_file) as fh:
        files = json.load(fh)["files"]
    with open(manifest_file, "w") as fh:
        json.dump(files, fh)  # demote to the legacy untagged shape

    rebuilt = bs.update_bloom_index(path)  # full rebuild (format mismatch)
    assert {(b["m"], b["k"]) for e in rebuilt.values() for b in e.values()} == {
        (big, 9)
    }
    assert bs.load_bloom_index(path) == rebuilt  # current format again


def test_maintenance_preserves_per_column_sizing(spark, tmp_path):
    """A hot column deliberately upsized (n_bits) must keep its size
    through update_bloom_index (new files) and compact_dataset (full
    rebuild) — never silently reset to the defaults."""
    from big_data_engineering_financial_analysis_spark.sources.dataset import compact_dataset

    path = str(tmp_path / "ds")
    df = _write(spark, path)
    big = bs.DEFAULT_N_BITS * 4
    bs.build_bloom_index(path, ["doc_id"], n_bits=big, n_hashes=9)

    def sizes(manifest):
        return {(b["m"], b["k"]) for e in manifest.values() for b in e.values()}

    # append new files, then incremental update: new entries same size
    df.limit(40).write.mode("append").parquet(path + "/lang=zz")
    m = bs.update_bloom_index(path)
    assert sizes(m) == {(big, 9)}

    # compaction rebuild: sizing survives the swap
    compact_dataset(spark, path, ["lang"], ["score"], max_records_per_file=50)
    m2 = bs.load_bloom_index(path)
    assert m2 and sizes(m2) == {(big, 9)}
    got = bs.read_point(spark, path, "doc_id", [3])
    exp = spark.read.parquet(path).filter(F.col("doc_id") == 3)
    assert _ids(got) == _ids(exp)


def test_point_read_int_probe_on_double_column(spark, tmp_path):
    """End-to-end: probing the double `score` column with Python ints must
    return exactly what full-scan + isin returns (isin casts int->double),
    i.e. the bloom may skip files but never the matching ones."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["score"])
    got = bs.read_point(spark, path, "score", [3, 77])
    exp = spark.read.parquet(path).filter(F.col("score").isin([3, 77]))
    assert _ids(got) == _ids(exp)
    assert len(_ids(got)) > 0  # the probe actually matches rows


def test_combined_pruning_beats_each_index_alone(spark, tmp_path):
    import datetime as dt

    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm

    path = str(tmp_path / "ds")
    t0 = dt.datetime(2024, 1, 1)
    # ts clustered (sort key), doc_id round-robin (unclustered)
    df = spark.createDataFrame(
        [
            {
                "doc_id": (i * 37) % 400,
                "lang": "en" if i % 4 else "de",
                "ts": t0 + dt.timedelta(minutes=i),
                "score": float(i % 100),
            }
            for i in range(400)
        ]
    )
    write_sharded(df, path, partition_cols=["lang"], sort_cols=["ts"], max_records_per_file=50)
    zm.build_zonemap(path, ["ts"])
    bs.build_bloom_index(path, ["doc_id"])

    lo, hi = t0 + dt.timedelta(minutes=100), t0 + dt.timedelta(minutes=200)
    probe = [3, 77]
    zkeep, total = zm.prune_files(path, "ts", lo=lo, hi=hi)
    bkeep, _ = bs.prune_files_eq(path, "doc_id", probe)
    ckeep, _ = bs.prune_files_combined(
        path, ranges=[("ts", lo, hi)], eq=[("doc_id", probe)]
    )
    assert set(ckeep) == set(zkeep) & set(bkeep)
    assert len(ckeep) <= min(len(zkeep), len(bkeep)) < total

    got = bs.read_skipped(spark, path, ranges=[("ts", lo, hi)], eq=[("doc_id", probe)])
    exp = (
        spark.read.parquet(path)
        .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
        .filter(F.col("doc_id").isin(probe))
    )
    assert sorted((r.doc_id, r.ts) for r in got.collect()) == sorted(
        (r.doc_id, r.ts) for r in exp.collect()
    )


def test_read_skipped_empty_in_list(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    assert bs.read_skipped(spark, path, eq=[("doc_id", [])]).count() == 0


def test_compaction_rebuilds_bloom_sidecar(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
    )

    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    keep0, total0 = bs.prune_files_eq(path, "doc_id", [3])
    assert 0 < len(keep0) < total0

    compact_dataset(spark, path, ["lang"], ["score"], max_records_per_file=80)

    # manifest went live with the swap: covers exactly the new files
    man = bs.load_bloom_index(path)
    assert man is not None
    assert sorted(man) == sorted(
        os.path.relpath(f, path) for f in bs._data_files(path)
    )
    # and still prunes + serves exactly
    keep1, total1 = bs.prune_files_eq(path, "doc_id", [3])
    assert 0 < len(keep1) < total1
    assert _ids(bs.read_point(spark, path, "doc_id", [3])) == [3]
