"""Real BMP/WAV codecs (operators/codecs.py) and their dispatch through
the multimodal Arrow operators: decode → transform → re-encode on actual
pixel/sample bytes, stdlib+numpy only."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators import codecs, multimodal
from big_data_engineering_financial_analysis_spark.schemas import ASSET_SCHEMA


def _rng_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- BMP


@pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (3, 1), (16, 30)])
def test_bmp_roundtrip_exact(h, w):
    """encode→decode is byte-exact for 24-bit RGB, including odd widths
    where rows carry 4-byte padding."""
    img = _rng_img(h, w, seed=h * 100 + w)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_bmp_top_down_rows():
    """Negative header height = top-down row order (valid BMP variant):
    the same file bytes decode to vertically mirrored pixels."""
    img = _rng_img(4, 6, seed=3)
    b = bytearray(codecs.encode_bmp(img))
    struct.pack_into("<i", b, 22, -4)  # reinterpret rows as top-down
    assert np.array_equal(codecs.decode_bmp(bytes(b)), img[::-1])


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"JUNKJUNKJUNK")
    b = bytearray(codecs.encode_bmp(_rng_img(2, 2)))
    struct.pack_into("<H", b, 28, 8)  # bpp=8
    with pytest.raises(NotImplementedError):
        codecs.decode_bmp(bytes(b))


def test_resize_rgb_solid_color_and_dims():
    solid = np.full((20, 30, 3), (10, 200, 55), dtype=np.uint8)
    out = codecs.resize_rgb(solid, 7, 5)
    assert out.shape == (5, 7, 3)
    assert (out == (10, 200, 55)).all()


def test_resize_rgb_halving_picks_grid_pixels():
    img = _rng_img(8, 8, seed=9)
    out = codecs.resize_rgb(img, 4, 4)
    assert np.array_equal(out, img[::2, ::2])


# ---------------------------------------------------------------- WAV


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    rng = np.random.default_rng(11)
    s = rng.integers(-(2**15), 2**15, (500, channels)).astype(np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(s, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxJUNK")


# ------------------------------------------------------------ features


def _smooth_img(h, w, phase=0.0):
    """Low-frequency synthetic photo stand-in: block-mean features are
    resize-stable for SMOOTH content (the natural-image case), not for
    iid noise — so the proximity property is asserted on smooth images."""
    y, x = np.mgrid[0:h, 0:w]
    r = 127 + 120 * np.sin(2 * np.pi * (x / w) + phase)
    g = 127 + 120 * np.cos(2 * np.pi * (y / h) + phase)
    b = 127 + 120 * np.sin(2 * np.pi * ((x + y) / (w + h)) + phase)
    return np.stack([r, g, b], axis=2).clip(0, 255).astype(np.uint8)


def test_image_features_contract_and_resize_proximity():
    """Unit norm, fixed dim, deterministic — and the load-bearing REAL
    property: a downscaled copy of a smooth image embeds near its
    original, a different image does not."""
    img = _smooth_img(64, 48)
    f = codecs.image_features(img, 64)
    assert len(f) == 64
    assert abs(sum(v * v for v in f) - 1.0) < 1e-9
    assert f == codecs.image_features(img, 64)

    small = codecs.resize_rgb(img, 24, 32)
    f_small = np.array(codecs.image_features(small, 64))
    other = np.array(codecs.image_features(_smooth_img(64, 48, phase=2.0), 64))
    cos_resized = float(np.dot(f, f_small))
    cos_other = float(np.dot(f, other))
    assert cos_resized > 0.9
    assert cos_resized > cos_other + 0.3


def test_audio_features_contract():
    rng = np.random.default_rng(5)
    s = (rng.normal(0, 3000, (4000, 1))).astype(np.int16)
    f = codecs.audio_features(s, 64)
    assert len(f) == 64
    assert abs(sum(v * v for v in f) - 1.0) < 1e-9
    assert f == codecs.audio_features(s, 64)


def test_image_features_any_dim_and_flat_degenerate():
    """Non-square dims pool to ceil(sqrt(dim))² then truncate; flat
    content returns None (no direction) for the caller's fallback."""
    f = codecs.image_features(_rng_img(16, 16, seed=4), 32)
    assert len(f) == 32 and abs(sum(v * v for v in f) - 1.0) < 1e-9
    assert codecs.image_features(np.full((64, 64, 3), 128, np.uint8), 64) is None


def test_audio_features_degenerate_empty_and_silent():
    assert codecs.audio_features(np.zeros((0, 1), np.int16), 64) is None
    assert codecs.audio_features(np.zeros((500, 1), np.int16), 64) is None


def test_feature_dispatch_is_total(spark):
    """One corpus with every awkward payload: empty WAV, silent WAV,
    solid-color BMP, a 32-bit BMP (undecodable pixels), a truncated
    'BM' blob, an IEEE-float WAV shell — extract_features never crashes
    and every row gets a unit-norm vector; byte-identical flat payloads
    embed identically (hash fallback)."""
    solid = codecs.encode_bmp(np.full((20, 20, 3), 77, np.uint8))
    bmp32 = bytearray(codecs.encode_bmp(_rng_img(4, 4)))
    struct.pack_into("<H", bmp32, 28, 32)
    rows = [
        (1, "audio", "audio/wav", codecs.encode_wav(np.zeros((0, 1), np.int16)), {}),
        (2, "audio", "audio/wav", codecs.encode_wav(np.zeros((400, 1), np.int16)), {}),
        (3, "image", "image/bmp", solid, {}),
        (4, "image", "image/bmp", solid, {}),  # byte-identical twin of 3
        (5, "image", "image/bmp", bytes(bmp32), {}),
        (6, "image", "image/bmp", b"BMshort", {}),
        (7, "audio", "audio/wav", b"RIFF\x04\x00\x00\x00WAVE", {}),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = {
        r.asset_id: np.array(r.feature)
        for r in multimodal.extract_features(assets).collect()
    }
    assert set(feats) == {1, 2, 3, 4, 5, 6, 7}
    for aid, f in feats.items():
        assert abs(float(f @ f) - 1.0) < 1e-6, aid
    assert np.allclose(feats[3], feats[4])  # identical flat bytes pair up


def test_resize_unsupported_formats_fail_clean(spark):
    """A 32-bit BMP (pixels we cannot decode) fails the resize with a
    CLEAN NotImplementedError, not a raw struct error, and never gets
    fake bytes written over it."""
    bmp32 = bytearray(codecs.encode_bmp(_rng_img(80, 400)))
    struct.pack_into("<H", bmp32, 28, 32)
    assets = spark.createDataFrame(
        [(1, "image", "image/bmp", bytes(bmp32), {})], ASSET_SCHEMA
    )
    with pytest.raises(Exception, match="resize needs a pixel codec"):
        multimodal.resize_assets(assets, max_dim=100).collect()


def test_decode_payload_clean_errors():
    """Truncated/garbage payloads raise the documented NotImplementedError
    (pre-codec behavior), never raw struct/wave errors."""
    for junk in (b"BMshort", b"RIFF\x00\x00\x00\x00WAVEjunk", b"\x89PNG\r\n"):
        with pytest.raises(NotImplementedError):
            multimodal._decode_payload(junk)


# ----------------------------------------------- Spark operator dispatch


def _real_assets(spark):
    img = codecs.encode_bmp(_rng_img(300, 400, seed=1))
    wav = codecs.encode_wav(
        np.random.default_rng(2).integers(-1000, 1000, (2200, 2)).astype(np.int16),
        sample_rate=16_000,
    )
    fake = multimodal.make_fake_payload(7, "image", 500, 120, 1)
    rows = [
        (1, "image", "image/bmp", img, {}),
        (2, "audio", "audio/wav", wav, {}),
        (7, "image", "application/x-fake-image", fake, {}),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_metadata_reads_real_headers(spark):
    meta = {
        r.asset_id: (r.width, r.height, r.n_frames)
        for r in multimodal.extract_metadata(_real_assets(spark)).collect()
    }
    assert meta[1] == (400, 300, 1)  # BMP: (width, height, 1)
    assert meta[2] == (16_000, 2, 2200)  # WAV: (rate, channels, frames)
    assert meta[7] == (500, 120, 1)  # FAKE path untouched


def test_resize_assets_real_pixels(spark):
    """The BMP row is actually resampled: output payload is a valid BMP
    whose decoded dims obey the max_dim clamp and whose pixels are the
    nearest-neighbor sample of the source; audio passes byte-identical."""
    assets = _real_assets(spark)
    out = {r.asset_id: bytes(r.payload) for r in multimodal.resize_assets(assets, max_dim=100).collect()}
    resized = codecs.decode_bmp(out[1])
    assert resized.shape == (75, 100, 3)  # 400x300 -> 100x75, aspect kept
    src = codecs.decode_bmp(codecs.encode_bmp(_rng_img(300, 400, seed=1)))
    assert np.array_equal(resized, codecs.resize_rgb(src, 100, 75))
    wav_in = {r.asset_id: bytes(r.payload) for r in assets.collect()}[2]
    assert out[2] == wav_in
    assert out[7][:4] == multimodal.MAGIC  # fake stays fake


def test_extract_features_real_content(spark):
    """Real features through the Spark path: the BMP row's vector equals
    the local codec computation (no drift between driver and executor
    arithmetic), same for WAV; the fake row keeps the hash features."""
    feats = {
        r.asset_id: list(r.feature)
        for r in multimodal.extract_features(_real_assets(spark)).collect()
    }
    img_local = codecs.image_features(_rng_img(300, 400, seed=1), multimodal.FEATURE_DIM)
    wav_local = codecs.audio_features(
        np.random.default_rng(2).integers(-1000, 1000, (2200, 2)).astype(np.int16),
        multimodal.FEATURE_DIM,
    )
    assert np.allclose(feats[1], img_local, atol=1e-6)
    assert np.allclose(feats[2], wav_local, atol=1e-6)
    fake = multimodal.make_fake_payload(7, "image", 500, 120, 1)
    assert np.allclose(
        feats[7], multimodal._fake_features(fake, multimodal.FEATURE_DIM), atol=1e-6
    )


def test_real_image_ingest_to_near_dup_e2e(spark):
    """The full multimodal claim, on ACTUAL pixels: BMP ingest →
    extract_features → embedding near-dup.  Resized copies of the same
    smooth image pair up above threshold; distinct images do not."""
    from big_data_engineering_financial_analysis_spark.operators.similarity import (
        embedding_dedup_pairs,
    )

    imgs = {
        1: _smooth_img(80, 60, phase=0.0),
        2: codecs.resize_rgb(_smooth_img(80, 60, phase=0.0), 30, 40),  # copy of 1
        3: _smooth_img(80, 60, phase=2.0),
        4: _smooth_img(80, 60, phase=4.0),
    }
    assets = spark.createDataFrame(
        [
            (aid, "image", "image/bmp", codecs.encode_bmp(img), {})
            for aid, img in imgs.items()
        ],
        ASSET_SCHEMA,
    )
    feats = multimodal.extract_features(assets).select(
        F.col("asset_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(feats, threshold=0.9).collect()
    }
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs), pairs
