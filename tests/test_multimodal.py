"""Multimodal column plumbing (operators/multimodal.py) — no SQL oracle
(binary + mapInPandas is not SQL-expressible); asserted against the
deterministic fake payload format instead."""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.make_fake_assets(spark, n=48).cache()


def test_extract_metadata_parses_headers(assets):
    out = mm.extract_metadata(assets).toPandas().set_index("asset_id").sort_index()
    assert len(out) == 48
    # regenerate expectations from the generator's formula
    for i in [0, 7, 23, 47]:
        assert out.loc[i, "width"] == 64 + (i % 8) * 16
        assert out.loc[i, "height"] == 48 + (i % 5) * 16
    assert (out["n_bytes"] > 11).all()


def test_sample_frames_fans_out_video_rows(assets):
    frames = mm.sample_frames(assets, every=4).toPandas()
    vids = assets.filter("modality = 'video'").count()
    assert frames["asset_id"].nunique() == vids
    assert (frames["frame_idx"] % 4 == 0).all()
    # deterministic frame payloads
    f2 = mm.sample_frames(assets, every=4).toPandas()
    merged = frames.merge(f2, on=["asset_id", "frame_idx"])
    assert (merged["frame_bytes_x"] == merged["frame_bytes_y"]).all()


def test_payload_stats_binary_relational(assets):
    stats = mm.payload_stats(assets).toPandas()
    # all fake payloads share the FAKE magic -> one hex group per modality
    assert set(stats["modality"]) == {"image", "audio", "video"}
    assert (stats["magic_hex"] == "46414b45").all()  # b"FAKE"


def test_decode_rejects_unknown_format():
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"\x89PNG....")


def test_arrow_metadata_matches_pandas_path(spark):
    from big_data_engineering_financial_analysis_spark.operators.multimodal import (
        extract_metadata,
        extract_metadata_arrow,
        make_fake_assets,
    )

    assets = make_fake_assets(spark, n=32)
    a = extract_metadata(assets).toPandas().sort_values("asset_id").reset_index(drop=True)
    b = (
        extract_metadata_arrow(assets)
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == 32
    for c in ("asset_id", "modality", "width", "height", "n_frames", "n_bytes"):
        assert (a[c] == b[c]).all(), c


def test_resize_clamps_long_edge_and_composes(assets):
    resized = mm.resize_assets(assets, max_dim=100)
    meta = mm.extract_metadata(resized).toPandas().set_index("asset_id").sort_index()
    orig = mm.extract_metadata(assets).toPandas().set_index("asset_id").sort_index()
    # schema round-trips: output composes with extract_metadata unchanged
    assert len(meta) == len(orig) == 48
    non_audio = orig["modality"] != "audio"
    assert (meta.loc[non_audio, ["width", "height"]].max(axis=1) <= 100).all()
    # aspect ratio preserved within integer truncation; never upscaled
    for i in meta.index[non_audio]:
        w0, h0 = int(orig.loc[i, "width"]), int(orig.loc[i, "height"])
        w1, h1 = int(meta.loc[i, "width"]), int(meta.loc[i, "height"])
        ew, eh = mm._resized_dims(w0, h0, 100)
        assert (w1, h1) == (ew, eh)
        assert w1 <= w0 and h1 <= h0
    # frame counts and audio rows untouched
    assert (meta["n_frames"] == orig["n_frames"]).all()
    audio_ids = orig.index[orig["modality"] == "audio"]
    raw = {
        r["asset_id"]: bytes(r["payload"])
        for r in assets.collect()
    }
    out = {
        r["asset_id"]: bytes(r["payload"])
        for r in resized.collect()
    }
    for i in audio_ids:
        assert out[i] == raw[i]


def test_resize_is_deterministic_and_noop_below_threshold(assets):
    a = {r["asset_id"]: bytes(r["payload"]) for r in mm.resize_assets(assets, max_dim=100).collect()}
    b = {r["asset_id"]: bytes(r["payload"]) for r in mm.resize_assets(assets, max_dim=100).collect()}
    assert a == b
    # max fake dim is 64+7*16=176 wide, 48+4*16=112 high -> max_dim=200 is a global no-op
    untouched = {r["asset_id"]: bytes(r["payload"]) for r in mm.resize_assets(assets, max_dim=200).collect()}
    orig = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    assert untouched == orig


def test_resized_dims_rule():
    assert mm._resized_dims(176, 112, 100) == (100, 63)
    assert mm._resized_dims(112, 176, 100) == (63, 100)
    assert mm._resized_dims(50, 40, 100) == (50, 40)  # never upscale
    assert mm._resized_dims(4000, 1, 100) == (100, 1)  # floor clamps to 1


def test_extract_features_contract(assets, spark):
    """Encoder-stage contract: fixed dim, float32 array, unit L2 norm,
    pure function of payload (identical payloads embed identically,
    distinct payloads don't)."""
    import math

    feats = mm.extract_features(assets, dim=32).toPandas()
    assert len(feats) == 48
    assert feats["feature"].map(len).eq(32).all()
    for vec in feats["feature"].head(8):
        assert math.isclose(math.fsum(float(v) ** 2 for v in vec), 1.0, rel_tol=1e-5)
    # determinism across independent runs
    again = mm.extract_features(assets, dim=32).toPandas()
    a = feats.sort_values("asset_id")["feature"].map(tuple).tolist()
    b = again.sort_values("asset_id")["feature"].map(tuple).tolist()
    assert a == b
    assert len(set(a)) == len(a)  # distinct payloads -> distinct vectors


def test_extract_features_feeds_similarity_search(assets, spark):
    """Multimodal ingest -> encode -> ANN, no schema adapter: a byte-
    identical duplicate asset must come back as its source's top-1
    neighbor at cosine 1.0 through operators.similarity.cosine_topk."""
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.similarity import cosine_topk

    dup = assets.filter(F.col("asset_id") == 3).withColumn(
        "asset_id", F.lit(1003).cast("long")
    )
    corpus = (
        mm.extract_features(assets.unionByName(dup))
        .select(F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding"))
    )
    top = cosine_topk(corpus, query_ids=[1003], k=1).collect()
    assert len(top) == 1
    assert top[0].neighbor_id == 3
    assert top[0].cos_sim == 1.0
