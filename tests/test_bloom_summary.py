"""Leaf-summary Bloom index — the two-level pruning structure.

A root-wide point probe on a sharded dataset used to open EVERY shard
manifest (measured 7.3 s over 1,024 shards at the r11 100k-file probe;
~10 GB of manifest reads at 1M files).  `_bloom_summary.json` holds one
union filter per (leaf, column) so whole leaves drop before any shard
opens.  The invariant under test everywhere here: pruning through the
summary ALWAYS equals full scan + filter — staleness of any kind
degrades to opening the shard, never to a wrong skip.
"""

from __future__ import annotations

import json
import os

from big_data_engineering_financial_analysis_spark.sources import bloomskip as bs
from big_data_engineering_financial_analysis_spark.sources.dataset import write_sharded

from tests.test_bloomskip_sharded import _rows, _write


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_summary_written_by_build_and_prunes_leaves_without_opening_shards(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)  # 3-leaf fixture
    path = str(tmp_path / "ds")
    df = _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    assert os.path.isfile(os.path.join(path, bs.SUMMARY_NAME))

    opened: list[str] = []
    real = bs._shard_files

    def spy(p, d, format_gated):
        opened.append(d)
        return real(p, d, format_gated)

    monkeypatch.setattr(bs, "_shard_files", spy)
    # doc_id 8 = row i=284 (8 * 37^-1 mod 300) -> lang "fr": the other
    # two leaves' union filters must reject it so their shards are
    # never opened
    keep, total = bs.prune_files_eq(path, "doc_id", [8])
    assert opened == ["lang=fr"]
    assert 0 < len(keep) < total
    got = bs.read_point(spark, path, "doc_id", [8])
    assert _ids(got) == [8]
    # result contract holds for a multi-partition probe too
    got2 = bs.read_point(spark, path, "doc_id", [8, 9])
    assert _ids(got2) == [8, 9]


def test_summary_ignores_appended_file_leaf_must_open(spark, tmp_path, monkeypatch):
    """A file appended WITHOUT index maintenance changes the leaf's
    basename set — the md5 seal fails, the leaf opens, and the appended
    file (unknown to the shard manifest) scans as before."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)  # 3-leaf fixture
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # plant a fresh doc_id=9999 row inside lang=en, bypassing the sink
    spark.createDataFrame(
        [{"doc_id": 9999, "score": 1.0}]
    ).coalesce(1).write.mode("append").parquet(os.path.join(path, "lang=en"))
    keep, _total = bs.prune_files_eq(path, "doc_id", [9999])
    assert any("lang=en" in f for f in keep)  # the new file is kept
    got = bs.read_point(spark, path, "doc_id", [9999])
    assert got.count() == 1


def test_summary_stale_fingerprint_degrades_to_shard_open(spark, tmp_path, monkeypatch):
    """A shard manifest rewritten after the summary was sealed fails the
    fingerprint check: the leaf opens and the shard decides per file."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)  # 3-leaf fixture
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # corrupt the SUMMARY's view by rewriting one shard byte-identically
    # plus a timestamp bump (content same -> per-file pruning unchanged)
    shard_fp = os.path.join(path, "lang=de", bs.MANIFEST_NAME)
    with open(shard_fp) as fh:
        obj = json.load(fh)
    with open(shard_fp, "w") as fh:
        json.dump(obj, fh, separators=(",", ": "))  # rewrite; size/mtime move
    keep, total = bs.prune_files_eq(path, "doc_id", [8])
    got = bs.read_point(spark, path, "doc_id", [8])
    assert _ids(got) == [8]
    assert 0 < len(keep) < total  # per-file blooms still prune


def test_summary_poisoned_union_never_skips_wrong(spark, tmp_path, monkeypatch):
    """Adversarial staleness: force a summary whose union REJECTS a key
    that exists, with a matching-looking entry — both seals must catch
    it (here the fingerprint, because rewriting the summary cannot fake
    the shard stat it sealed at build time... so fake THAT too and rely
    on the md5 seal failing instead is impossible — basenames match.
    The honest statement: if an attacker controls both seals AND the
    union bits the index lies, exactly like a hand-edited per-file
    manifest would.  What this test pins is the REACHABLE failure:
    a summary left over from a PREVIOUS build of the same directory
    (old shard bytes) never mis-prunes, because the fingerprint moved."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)  # 3-leaf fixture
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    with open(os.path.join(path, bs.SUMMARY_NAME)) as fh:
        old_summary = fh.read()
    # rebuild (e.g. after a compaction rewrote files): shard bytes move
    bs.build_bloom_index(path, ["doc_id"])
    # resurrect the stale summary wholesale
    with open(os.path.join(path, bs.SUMMARY_NAME), "w") as fh:
        fh.write(old_summary)
    got = bs.read_point(spark, path, "doc_id", [8])
    assert _ids(got) == [8]


def test_summary_dead_when_root_manifest_stale(spark, tmp_path):
    """The stale-root rule covers the summary: a legacy root disables
    the WHOLE index — no leaf may be summary-pruned through it."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    full = bs.load_bloom_index(path)
    with open(os.path.join(path, bs.MANIFEST_NAME), "w") as fh:
        json.dump(full, fh)  # legacy untagged root
    assert bs._load_bloom_summary(path) is None
    keep, total = bs.prune_files_eq(path, "doc_id", [3])
    assert len(keep) == total


def test_summary_refreshed_by_dirs_bounded_update(spark, tmp_path, monkeypatch):
    """The streaming sink's per-batch maintenance path
    (update_bloom_index(dirs=...)) keeps the touched leaf's summary
    entry fresh: new keys remain findable AND the refreshed union still
    prunes the leaf for absent keys without opening its shard."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)  # 3-leaf fixture
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    extra = spark.createDataFrame(
        [{"doc_id": 7777, "lang": "en", "score": 0.5}]
    )
    write_sharded(
        extra, path, partition_cols=["lang"], sort_cols=["doc_id"],
        mode="append",
    )
    bs.update_bloom_index(path, ["doc_id"], dirs=["lang=en"])
    got = bs.read_point(spark, path, "doc_id", [7777])
    assert got.count() == 1
    # the refreshed entry seals the NEW shard bytes: an absent key's
    # probe may drop lang=en again without opening its shard
    summary = bs._load_bloom_summary(path)
    assert summary is not None
    assert summary["lang=en"]["fp"] == bs._shard_fingerprint(path, "lang=en")
    keep, total = bs.prune_files_eq(path, "doc_id", [555_555])
    assert keep == [] and total > 0


def test_summary_streaming_build_matches_inmemory(spark, tmp_path, monkeypatch):
    """The streamed build's fold writes the same unions and file seals
    as the in-memory rebuild of the SAME tree (fingerprints move with
    the shard rewrites; everything else must be identical)."""
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"], spark=spark)
    with open(os.path.join(path, bs.SUMMARY_NAME)) as fh:
        mem = json.load(fh)
    monkeypatch.setattr(bs, "BUILD_STREAM_BYTES", 0)
    out = bs.build_bloom_index(path, ["doc_id"], spark=spark)
    assert out.get("streamed") is True
    with open(os.path.join(path, bs.SUMMARY_NAME)) as fh:
        stream = json.load(fh)

    def strip_fp(summary):
        return {
            leaf: {k: v for k, v in e.items() if k != "fp"}
            for leaf, e in summary["leaves"].items()
        }

    assert strip_fp(mem) == strip_fp(stream)


def test_leaf_summary_cols_mixed_sizing_and_gaps():
    """Unit semantics of the union fold: mixed (m, k) columns are NOT
    summarized (an upsized hot column mid-migration must not prune
    through a wrong-sized union); all-gap columns summarize to the
    empty marker (maximal pruning); a column missing from ANY file is
    not summarized (that file must always scan)."""
    f = bs._Bloom(64, 3)
    f.add(42)
    real = f.encode()
    other = bs._Bloom(128, 3)
    other.add(42)
    files = {
        "a.parquet": {"x": real, "y": bs._empty_filter(64, 3), "z": real},
        "b.parquet": {"x": other.encode(), "y": bs._empty_filter(64, 3)},
    }
    cols = bs._leaf_summary_cols(files)
    assert "x" not in cols          # mixed sizing
    assert cols["y"].get("empty")   # all gaps -> empty marker
    assert "z" not in cols          # absent from b.parquet
    # and a real union admits every member's keys
    g = bs._Bloom(64, 3)
    g.add(7)
    union = bs._leaf_summary_cols(
        {"a": {"x": real}, "b": {"x": g.encode()}}
    )["x"]
    u = bs._Bloom.decode(union)
    assert u.might_contain(42) and u.might_contain(7)


def test_summary_removed_on_flat_rebuild(spark, tmp_path):
    """A dataset rebuilt FLAT (no partitions) carries no summary; a
    stale one from its sharded life is removed by the build."""
    path = str(tmp_path / "flat")
    spark.createDataFrame(_rows()).repartition(4).write.parquet(path)
    # plant a bogus summary from a previous sharded incarnation
    with open(os.path.join(path, bs.SUMMARY_NAME), "w") as fh:
        json.dump({"format": bs.KEY_FORMAT, "leaves": {}}, fh)
    bs.build_bloom_index(path, ["doc_id"])
    assert not os.path.exists(os.path.join(path, bs.SUMMARY_NAME))
    got = bs.read_point(spark, path, "doc_id", [3])
    assert _ids(got) == [3]


def test_summary_union_has_no_false_negatives():
    """Property (hypothesis): the leaf union filter admits EVERY key any
    member file's filter admits — the one algebraic fact the whole
    summary-prune safety argument rests on (bitwise OR can only turn
    bits on, so might_contain can only get MORE permissive)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        file_keys=st.lists(
            st.lists(
                st.one_of(
                    st.integers(min_value=-(2**63), max_value=2**63 - 1),
                    st.floats(allow_nan=False, allow_infinity=False),
                    st.text(max_size=8),
                ),
                max_size=16,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def run(file_keys):
        files = {}
        for i, keys in enumerate(file_keys):
            b = bs._Bloom(256, 3)
            for k in keys:
                b.add(k)
            files[f"f{i}.parquet"] = {"x": b.encode()}
        union = bs._Bloom.decode(bs._leaf_summary_cols(files)["x"])
        for keys in file_keys:
            for k in keys:
                assert union.might_contain(k)

    run()


def test_leaf_summary_cols_corrupt_bits_skip_column_not_crash():
    """A corrupt/oversized 'bits' payload (decoded length != (m+7)//8)
    must skip summarizing THAT column — never raise out of the build
    (advice r11: the rest of the sidecar layer degrades gracefully on
    bad content; the fold must too).  Healthy columns still summarize."""
    import base64

    good = bs._Bloom(64, 3)
    good.add(1)
    oversized = dict(good.encode())
    oversized["bits"] = base64.b64encode(b"\xff" * 64).decode()  # 64 != 8
    truncated = dict(good.encode())
    truncated["bits"] = base64.b64encode(b"\xff").decode()  # 1 != 8
    garbage = dict(good.encode())
    garbage["bits"] = "!!not-base64!!"
    missing = {k: v for k, v in good.encode().items() if k != "bits"}
    files = {
        "a.parquet": {
            "big": oversized, "small": truncated, "bad": garbage,
            "gone": missing, "ok": good.encode(),
        },
        "b.parquet": {
            "big": good.encode(), "small": good.encode(),
            "bad": good.encode(), "gone": good.encode(),
            "ok": good.encode(),
        },
    }
    cols = bs._leaf_summary_cols(files)  # must not raise
    assert set(cols) == {"ok"}
    assert bs._Bloom.decode(cols["ok"]).might_contain(1)


def test_summary_dirs_update_pops_leaf_with_no_live_files(
    spark, tmp_path, monkeypatch
):
    """update_bloom_index(dirs=...) on a partition whose data files were
    ALL deleted drops its summary entry (advice r11: the sealed-but-dead
    row is inert thanks to the fingerprint, but the root-wide prune
    would keep stat-ing it forever).  Untouched leaves keep theirs."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    assert "lang=fr" in bs._load_bloom_summary(path)
    for f in bs._data_files(os.path.join(path, "lang=fr")):
        os.remove(f)
    bs.update_bloom_index(path, ["doc_id"], dirs=["lang=fr", "lang=en"])
    summary = bs._load_bloom_summary(path)
    assert "lang=fr" not in summary
    assert "lang=en" in summary and "lang=de" in summary
    # the index still serves the surviving partitions
    got = bs.read_point(spark, path, "lang", ["de"])
    assert got.count() > 0


def test_summary_fast_reject_skips_walk_and_keeps_total_exact(
    spark, tmp_path, monkeypatch
):
    """The walk-free fast path (r11 ask #5): an absent-key probe skips
    summary-sealed leaves WITHOUT listing their files — and the pruned
    total still counts them exactly (the sealed per-leaf n)."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    from big_data_engineering_financial_analysis_spark.sources.zonemap import count_data_files

    total_files = count_data_files(path)
    skip, n = bs._summary_fast_reject(
        path, [("doc_id", [555_555])], lambda d: True
    )
    assert skip == {"lang=en", "lang=de", "lang=fr"}
    assert n == total_files
    keep, total = bs.prune_files_eq(path, "doc_id", [555_555])
    assert keep == [] and total == total_files
    # a present key must NOT fast-reject its leaf, and the read serves it
    skip2, _ = bs._summary_fast_reject(path, [("doc_id", [3])], lambda d: True)
    assert skip2 != {"lang=en", "lang=de", "lang=fr"}
    assert _ids(bs.read_point(spark, path, "doc_id", [3])) == [3]


def test_summary_fast_reject_conservative_on_out_of_band_file_add(
    spark, tmp_path, monkeypatch
):
    """A data file added WITHOUT an index update moves the leaf-dir
    fingerprint: the fast path must fall back to listing (never skip a
    leaf whose basename set drifted from its seal) and the new file
    must be scanned."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    # out-of-band write into lang=en: a row with an otherwise-absent key
    extra = spark.createDataFrame(
        [{"doc_id": 555_555, "score": 0.0}]
    )
    extra.coalesce(1).write.mode("append").parquet(f"{path}/lang=en")
    skip, _ = bs._summary_fast_reject(
        path, [("doc_id", [555_555])], lambda d: True
    )
    assert "lang=en" not in skip          # dfp moved -> no walk-free skip
    assert {"lang=de", "lang=fr"} <= skip  # untouched leaves still skip
    keep, _total = bs.prune_files_eq(path, "doc_id", [555_555])
    assert any("lang=en" in f for f in keep)  # uncovered file is scanned


def test_dir_seal_self_heals_after_foreign_sidecar_write(
    spark, tmp_path, monkeypatch
):
    """A zonemap build AFTER the Bloom build writes into every leaf dir
    and drifts every dfp seal; the next listed prune must re-state the
    seals (content provably unchanged) so the probe after THAT is
    walk-free again.  Survivors identical throughout."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    from big_data_engineering_financial_analysis_spark.sources import zonemap as zm

    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    zm.build_zonemap(path, ["score"])  # disturbs every leaf dir
    skip0, _ = bs._summary_fast_reject(
        path, [("doc_id", [555_555])], lambda d: True
    )
    assert skip0 == set()  # every dfp drifted: fast path falls back
    keep1, total1 = bs.prune_files_eq(path, "doc_id", [555_555])  # heals
    assert keep1 == [] and total1 > 0
    skip2, n2 = bs._summary_fast_reject(
        path, [("doc_id", [555_555])], lambda d: True
    )
    assert skip2 == {"lang=en", "lang=de", "lang=fr"} and n2 == total1
    keep3, total3 = bs.prune_files_eq(path, "doc_id", [555_555])
    assert keep3 == [] and total3 == total1


def test_fast_reject_never_skips_nested_data_dirs(spark, tmp_path, monkeypatch):
    """Mixed-depth layout: data files directly in a leaf AND in a dir
    nested under it.  Subtree-skipping the outer leaf would silently
    hide the nested files from the scan — leaves sealed with subdirs
    present must never fast-skip (they take the listed path)."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "nested")
    outer = spark.createDataFrame([{"doc_id": i, "score": 0.0} for i in range(10)])
    inner = spark.createDataFrame([{"doc_id": 555_555, "score": 1.0}])
    outer.coalesce(1).write.parquet(f"{path}/a=1")
    inner.coalesce(1).write.parquet(f"{path}/a=1/b=2")
    other = spark.createDataFrame([{"doc_id": 77, "score": 2.0}])
    other.coalesce(1).write.parquet(f"{path}/a=2")
    bs.build_bloom_index(path, ["doc_id"])
    # the key lives ONLY in the nested dir; a=1's own union rejects it
    skip, _n = bs._summary_fast_reject(
        path, [("doc_id", [555_555])], lambda d: True
    )
    assert "a=1" not in skip  # sealed subdirs=True -> no subtree skip
    keep, _total = bs.prune_files_eq(path, "doc_id", [555_555])
    assert any(f"a=1{os.sep}b=2" in f for f in keep)
    # childless leaves still fast-skip
    assert "a=2" in skip


def test_corrupt_summary_entries_degrade_not_crash_the_prune(
    spark, tmp_path, monkeypatch
):
    """Structurally-corrupt summary content (non-dict filter, bad
    base64, truncated bitmap) must degrade the probe path to
    must-open — never raise out of prune_files_eq."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    with open(os.path.join(path, bs.SUMMARY_NAME)) as fh:
        obj = json.load(fh)
    leaves = sorted(obj["leaves"])
    obj["leaves"][leaves[0]]["cols"]["doc_id"] = "garbage"
    obj["leaves"][leaves[1]]["cols"]["doc_id"] = {"m": 65536, "k": 6, "bits": "!!"}
    trunc = obj["leaves"][leaves[2]]["cols"].get("doc_id")
    if isinstance(trunc, dict) and not trunc.get("empty"):
        trunc["bits"] = trunc["bits"][:8]
    with open(os.path.join(path, bs.SUMMARY_NAME), "w") as fh:
        json.dump(obj, fh)
    keep, total = bs.prune_files_eq(path, "doc_id", [3])  # must not raise
    assert total > 0
    assert _ids(bs.read_point(spark, path, "doc_id", [3])) == [3]


def test_dirs_update_journals_instead_of_rewriting_base(
    spark, tmp_path, monkeypatch
):
    """The per-batch maintenance write is O(touched): a dirs-bounded
    update appends to the journal and leaves the base summary file
    byte-untouched, while readers see the merged view (fresh keys
    found, refreshed seals prune)."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    base_stat = os.stat(os.path.join(path, bs.SUMMARY_NAME))
    extra = spark.createDataFrame(
        [{"doc_id": 7777, "lang": "en", "score": 0.5}]
    )
    write_sharded(
        extra, path, partition_cols=["lang"], sort_cols=["doc_id"],
        mode="append",
    )
    bs.update_bloom_index(path, ["doc_id"], dirs=["lang=en"])
    after = os.stat(os.path.join(path, bs.SUMMARY_NAME))
    assert (after.st_mtime_ns, after.st_ino) == (
        base_stat.st_mtime_ns, base_stat.st_ino,
    )
    assert os.path.exists(os.path.join(path, bs.JOURNAL_NAME))
    # merged view serves: new key found, absent key prunes everywhere
    assert bs.read_point(spark, path, "doc_id", [7777]).count() == 1
    keep, total = bs.prune_files_eq(path, "doc_id", [555_555])
    assert keep == [] and total > 0
    # dead-leaf tombstone rides the journal too
    for f in bs._data_files(os.path.join(path, "lang=fr")):
        os.remove(f)
    bs.update_bloom_index(path, ["doc_id"], dirs=["lang=fr", "lang=en"])
    assert "lang=fr" not in bs._load_bloom_summary(path)


def test_summary_journal_folds_and_survives_torn_tail(
    spark, tmp_path, monkeypatch
):
    """A journal past its size trade folds into one fresh base write
    (journal cleared); a torn trailing line (crash mid-append) is
    skipped and the affected leaf degrades to opening its shard."""
    monkeypatch.setattr(bs, "SUMMARY_MIN_LEAVES", 0)
    monkeypatch.setattr(bs, "JOURNAL_FOLD_MIN_BYTES", 0)
    monkeypatch.setattr(bs, "JOURNAL_FOLD_FRAC", 0.0)
    path = str(tmp_path / "ds")
    _write(spark, path)
    bs.build_bloom_index(path, ["doc_id"])
    extra = spark.createDataFrame(
        [{"doc_id": 7777, "lang": "en", "score": 0.5}]
    )
    write_sharded(
        extra, path, partition_cols=["lang"], sort_cols=["doc_id"],
        mode="append",
    )
    bs.update_bloom_index(path, ["doc_id"], dirs=["lang=en"])
    # zero thresholds -> every append folds immediately
    assert not os.path.exists(os.path.join(path, bs.JOURNAL_NAME))
    keep, _ = bs.prune_files_eq(path, "doc_id", [555_555])
    assert keep == []
    # torn tail: valid tombstone line + garbage tail — reader skips the
    # garbage, applies the tombstone, and the prune stays conservative
    with open(os.path.join(path, bs.JOURNAL_NAME), "w") as fh:
        fh.write(json.dumps({"leaf": "lang=de", "entry": None}) + "\n")
        fh.write('{"leaf": "lang=en", "entry"')  # torn mid-write
    merged = bs._load_bloom_summary(path)
    assert "lang=de" not in merged and "lang=en" in merged
    assert bs.read_point(spark, path, "doc_id", [7777]).count() == 1
