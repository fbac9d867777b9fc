"""Export manifests: distributed shard hashing, rebuild stability
across export formats, and the verify diff (missing/added/corrupted)."""

from __future__ import annotations

import os

import pytest

from big_data_engineering_financial_analysis_spark.operators import export_manifest as em

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    return load_table(spark, SF_DIR, "documents").cache()


def test_manifest_covers_shards_and_skips_metadata(spark, docs, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources.jsonl import write_corpus_jsonl

    p = str(tmp_path / "rel")
    write_corpus_jsonl(docs, p, n_shards=3, seed=1)
    m = em.write_export_manifest(spark, p, extra={"seed": 1, "n_shards": 3})
    assert m["n_files"] == 3 and len(m["files"]) == 3
    assert all(rel.startswith("shard=") for rel in m["files"])
    assert m["extra"] == {"seed": 1, "n_shards": 3}
    assert m["total_bytes"] == sum(v["bytes"] for v in m["files"].values())
    # the manifest file itself is metadata — a re-manifest is unchanged
    m2 = em.write_export_manifest(spark, p, extra={"seed": 1, "n_shards": 3})
    assert m2["files"] == m["files"]


def test_webdataset_rebuild_hashes_stable(spark, tmp_path):
    """Canonical tar bytes => same manifest from two independent writes —
    the property that makes a manifest diff a real data diff."""
    from big_data_engineering_financial_analysis_spark.operators import multimodal, webdataset

    assets = multimodal.make_fake_assets(spark, 12)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    webdataset.write_webdataset(assets, a, n_shards=2, seed=5)
    webdataset.write_webdataset(assets, b, n_shards=2, seed=5)
    ma = em.write_export_manifest(spark, a)
    mb = em.write_export_manifest(spark, b)
    assert ma["files"] == mb["files"]


def test_verify_detects_missing_added_corrupted(spark, docs, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources.jsonl import write_corpus_jsonl

    p = str(tmp_path / "rel")
    write_corpus_jsonl(docs, p, n_shards=2, seed=0)
    em.write_export_manifest(spark, p)
    assert em.verify_export(spark, p)["ok"]

    # corrupt one shard member, delete nothing yet
    shard_files = [
        os.path.join(root, f)
        for root, _, files in os.walk(p)
        for f in files
        if f.endswith(".json") and not f.startswith(("_", "."))
    ]
    with open(shard_files[0], "a") as fh:
        fh.write('{"doc_id": 999999, "text": "tampered"}\n')
    # drop Hadoop LocalFS's .crc sidecar for the tampered file: with it
    # stale, the scan itself fails on ChecksumException (also detection,
    # but the fail-loud kind); object stores have no such sidecars, so
    # the hash-compare path is what runs in production
    d, base = os.path.split(shard_files[0])
    crc = os.path.join(d, f".{base}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    r = em.verify_export(spark, p)
    assert not r["ok"] and len(r["corrupted"]) == 1

    # remove it entirely -> missing; drop a stray file -> added
    os.remove(shard_files[0])
    with open(os.path.join(p, "stray.json"), "w") as fh:
        fh.write("{}\n")
    r = em.verify_export(spark, p)
    assert not r["ok"]
    assert len(r["missing"]) == 1 and r["added"] == ["stray.json"]


def test_verify_without_manifest_raises(spark, tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    with pytest.raises(ValueError, match="nothing to verify"):
        em.verify_export(spark, d)
