"""WebDataset tar-shard export/ingest: round-trip fidelity, canonical
(byte-identical) shard bytes, shuffle-order members, and the multimodal
composition path."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pytest

from big_data_engineering_financial_analysis_spark.operators import multimodal, webdataset

N_ASSETS = 24
N_SHARDS = 3


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.make_fake_assets(spark, N_ASSETS).cache()


def test_roundtrip(spark, assets, tmp_path):
    out = str(tmp_path / "wds")
    paths = webdataset.write_webdataset(assets, out, n_shards=N_SHARDS, seed=1)
    assert len(paths) == N_SHARDS
    back = webdataset.read_webdataset(spark, out)
    assert back.schema == assets.schema

    def canon(df):
        return sorted(
            (r.asset_id, r.modality, r.media_type, bytes(r.payload),
             tuple(sorted(r.meta.items())))
            for r in df.collect()
        )

    assert canon(back) == canon(assets)


def test_canonical_bytes(spark, assets, tmp_path):
    """Two writes of the same frame produce byte-identical shard files —
    the property that makes shard-level content hashing meaningful."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pa = webdataset.write_webdataset(assets, a, n_shards=N_SHARDS, seed=1)
    pb = webdataset.write_webdataset(assets, b, n_shards=N_SHARDS, seed=1)

    def digest(p):
        with open(p, "rb") as fh:
            return hashlib.md5(fh.read()).hexdigest()

    assert [digest(p) for p in pa] == [digest(p) for p in pb]


def test_member_order_is_shuffle_order(spark, assets, tmp_path):
    """Within each tar, samples appear in the seeded shuffle order (json
    member immediately before its payload member), matching the
    export-family order key."""
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.export import _shard_of, _shuffle_key

    out = str(tmp_path / "order")
    paths = webdataset.write_webdataset(assets, out, n_shards=N_SHARDS, seed=9)
    expected = {s: [] for s in range(N_SHARDS)}
    rows = (
        assets.select(
            "asset_id",
            _shuffle_key(F.col("asset_id"), 9).alias("k"),
        )
        .withColumn("s", _shard_of(F.col("k"), N_SHARDS))
        .collect()
    )
    for r in sorted(rows, key=lambda r: (r.s, r.k, r.asset_id)):
        expected[r.s].append(r.asset_id)
    for p in paths:
        shard = int(os.path.basename(p).split("-")[1].split(".")[0])
        with tarfile.open(p) as tar:
            names = tar.getnames()
        # json-then-bin pairs, in order
        ids = [int(n.split(".")[0]) for n in names[::2]]
        assert [n.split(".")[1] for n in names[::2]] == ["json"] * len(ids)
        assert [n.split(".")[1] for n in names[1::2]] == ["bin"] * len(ids)
        assert ids == expected[shard]


def test_null_payload_fails_clean(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "image", "application/x-fake-image", None, {"o": "x"})],
        multimodal.ASSET_SCHEMA,
    )
    with pytest.raises(Exception, match="NULL payload"):
        webdataset.write_webdataset(df, str(tmp_path / "bad"), n_shards=1)


def test_metadata_null_map_roundtrips(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, "audio", None, b"\x00\x01", None)], multimodal.ASSET_SCHEMA
    )
    out = str(tmp_path / "nulls")
    webdataset.write_webdataset(df, out, n_shards=1)
    row = webdataset.read_webdataset(spark, out).first()
    assert row.media_type is None and row.meta is None
    assert bytes(row.payload) == b"\x00\x01"


def test_composes_with_multimodal_operators(spark, assets, tmp_path):
    """Ingested shards feed the multimodal feature pipeline unchanged —
    the format is a transport, not a schema fork."""
    out = str(tmp_path / "pipe")
    webdataset.write_webdataset(assets, out, n_shards=2, seed=3)
    back = webdataset.read_webdataset(spark, out)
    feats = multimodal.extract_features(back, dim=16)
    rows = feats.collect()
    assert len(rows) == N_ASSETS
    direct = {
        r.asset_id: r.feature for r in multimodal.extract_features(assets, 16).collect()
    }
    for r in rows:
        assert r.feature == direct[r.asset_id]


def test_streaming_sink_accumulates_and_replays_idempotent(spark, assets, tmp_path):
    """Asset stream -> per-batch tar shards via foreachBatch: the
    accumulated directory reads back as the full input, and a
    redelivered batch id is a no-op (marker protocol)."""
    src = str(tmp_path / "src")
    half = N_ASSETS // 2
    a1 = assets.filter(f"asset_id < {half}")
    a2 = assets.filter(f"asset_id >= {half}")
    a1.coalesce(1).write.mode("append").parquet(src)
    a2.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "wds_stream")
    sink = webdataset.webdataset_sink(out, n_shards_per_batch=2, seed=4)
    stream = (
        spark.readStream.schema(assets.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    files = sorted(os.listdir(out))
    tars = [f for f in files if f.endswith(".tar")]
    assert len(tars) == 4  # 2 batches x 2 shards
    back = webdataset.read_webdataset(spark, out)
    assert sorted(r.asset_id for r in back.collect()) == list(range(N_ASSETS))

    # replay: re-invoking an already-committed epoch changes nothing
    before = {f: os.path.getmtime(os.path.join(out, f)) for f in tars}
    sink(a1, 0)
    after = {f: os.path.getmtime(os.path.join(out, f)) for f in tars}
    assert after == before
    assert sorted(f for f in os.listdir(out) if f.endswith(".tar")) == tars


def test_missing_payload_member_fails_clean(spark, tmp_path):
    out = str(tmp_path / "broken")
    os.makedirs(out)
    with tarfile.open(os.path.join(out, "shard-00000.tar"), "w") as tar:
        data = b'{"asset_id": 1, "modality": "image", "media_type": null, "meta": null}'
        info = tarfile.TarInfo(name="000000000001.json")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with pytest.raises(Exception, match="no payload member"):
        webdataset.read_webdataset(spark, out).collect()


def test_second_writer_id_does_not_collide_with_first(spark, assets, tmp_path):
    """Batch ids restart at 0 under a fresh checkpoint: without its own
    writer_id a second query's first batch would be skipped as a replay
    of the first writer's batch 0."""
    out = str(tmp_path / "wds_two")
    half = N_ASSETS // 2
    a1 = assets.filter(f"asset_id < {half}")
    a2 = assets.filter(f"asset_id >= {half}")
    webdataset.webdataset_sink(out, seed=4)(a1, 0)  # writer 1, batch 0
    sink2 = webdataset.webdataset_sink(out, seed=4, writer_id="w2")
    sink2(a2, 0)  # ALSO batch 0 — must still commit
    back = webdataset.read_webdataset(spark, out)
    assert sorted(r.asset_id for r in back.collect()) == list(range(N_ASSETS))
    # and writer 2's replay of ITS batch 0 is still a no-op
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    sink2(a2, 0)
    assert sorted(f for f in os.listdir(out) if f.endswith(".tar")) == tars
