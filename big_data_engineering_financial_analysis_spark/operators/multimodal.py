"""Multimodal (image/audio/video) column plumbing.

Policy: media travel as opaque ``binary`` payload columns with typed
metadata (schemas.ASSET_SCHEMA), and every media transformation is an
Arrow-batched ``mapInPandas`` operator — binary never round-trips through
Python row objects.

Codec dispatch is on payload magic:

* ``BM`` (24-bit uncompressed BMP) and ``RIFF..WAVE`` (PCM WAV) take
  REAL paths — stdlib/numpy codecs in :mod:`.codecs`, no external
  libraries: decode → transform pixels/samples → re-encode, and
  features are genuine content features (block-mean luma pooling /
  RMS energy envelope), so a resized image embeds NEAR its original.
* The deterministic FAKE format below keeps its original byte-exact
  path — the ``asset_resize`` oracle and plumbing tests depend on it.
* Compressed/container formats (JPEG/PNG/MP3/MP4) remain the documented
  external-codec boundary: PIL/ffmpeg plug into the same dispatch.

Fake payload format (deterministic, self-describing):

    b"FAKE" + modality[0] + width(2B big-endian) + height(2B) +
    n_frames(2B) + md5-derived filler bytes
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.schemas import ASSET_SCHEMA

MAGIC = b"FAKE"

try:  # real decoder hook — not present in this container, by design
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def make_fake_payload(asset_id: int, modality: str, width: int, height: int, n_frames: int) -> bytes:
    filler = hashlib.md5(f"payload-{asset_id}".encode()).digest() * 4
    return MAGIC + modality[:1].encode() + struct.pack(">HHH", width, height, n_frames) + filler


def make_fake_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table matching ASSET_SCHEMA."""
    mods = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        modality = mods[i % 3]
        w, h = 64 + (i % 8) * 16, 48 + (i % 5) * 16
        frames = 1 if modality == "image" else 8 + i % 24
        rows.append(
            (
                i,
                modality,
                f"application/x-fake-{modality}",
                make_fake_payload(i, modality, w, h, frames),
                {"origin": f"synth-{i % 4}"},
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _bmp_header(b: bytes) -> tuple[int, int, int, int] | None:
    """Conservative BMP sniff: (width, height, bpp, compression) when
    ``b`` carries a plausible complete BMP header, else None.  A 2-byte
    magic alone misroutes ~1/65k of arbitrary blobs and a truncated
    header would raise raw struct.error — so require full header length
    and sane fields before trusting the parse."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    w, h, planes, bpp, comp = struct.unpack_from("<iiHHI", b, 18)
    if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32) or comp > 3 or w == 0 or h == 0:
        return None
    return abs(w), abs(h), bpp, comp


def _wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """Conservative WAV sniff: (sample_rate, channels, n_frames,
    sample_width) for PCM payloads the stdlib ``wave`` module accepts,
    else None (compressed/float WAV raises wave.Error inside)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(b), "rb") as wf:
            return (
                wf.getframerate(),
                wf.getnchannels(),
                wf.getnframes(),
                wf.getsampwidth(),
            )
    except (wave.Error, EOFError):
        return None


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """Parse (width, height, n_frames) from a payload header.

    Real formats are read HEADER-ONLY here (no pixel/sample IO):

    * BMP (any plausible header, metadata needs no pixel codec)
      → (width, height, 1)
    * PCM WAV → (sample_rate, n_channels, n_sample_frames) — the audio
      reading of the (width, height, frames) triple; "frames" is the
      wave module's own term for per-channel sample rows.

    Anything else raises a CLEAN NotImplementedError (never a raw
    struct/wave error): compressed formats genuinely need external
    codecs (PIL/ffmpeg), which plug in here.
    """
    b = bytes(payload)
    if b[:4] == MAGIC:
        return struct.unpack(">HHH", b[5:11])
    bmp = _bmp_header(b)
    if bmp is not None:
        return bmp[0], bmp[1], 1
    wav = _wav_header(b)
    if wav is not None:
        return wav[0], wav[1], wav[2]
    if HAVE_PIL:
        raise NotImplementedError("real codec path not wired up in this build")
    raise NotImplementedError(
        "no codec available for this payload format (compressed formats "
        "need PIL/ffmpeg; 24-bit BMP / PCM WAV / FAKE are supported natively)"
    )


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Decode header metadata from payloads via Arrow-batched mapInPandas.

    Binary stays in Arrow buffers end-to-end; output schema is explicit so
    the operator composes with downstream relational ops.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode_payload)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "n_frames": meta.map(lambda m: m[2]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return assets.mapInPandas(
        op,
        schema="asset_id long, modality string, width int, height int, n_frames int, n_bytes long",
    )


def extract_metadata_arrow(assets: DataFrame) -> DataFrame:
    """`mapInArrow` twin of :func:`extract_metadata` — operates on raw
    ``pyarrow.RecordBatch``es with zero pandas materialization.  For
    binary-heavy columns this skips the Arrow->pandas object-array copy
    (every payload becomes a Python ``bytes`` under mapInPandas), which is
    the dominant cost when payloads are megabytes; parity with the pandas
    path is asserted in tests."""
    import pyarrow as pa

    def op(batches):
        for batch in batches:
            payloads = batch.column("payload").to_pylist()
            meta = [_decode_payload(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("asset_id"),
                    batch.column("modality"),
                    pa.array([m[0] for m in meta], pa.int32()),
                    pa.array([m[1] for m in meta], pa.int32()),
                    pa.array([m[2] for m in meta], pa.int32()),
                    pa.array([len(p) for p in payloads], pa.int64()),
                ],
                names=["asset_id", "modality", "width", "height", "n_frames", "n_bytes"],
            )

    return assets.mapInArrow(
        op,
        schema="asset_id long, modality string, width int, height int, n_frames int, n_bytes long",
    )


def sample_frames(assets: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: fan each video row out to one row per sampled frame.

    Row-expanding mapInPandas — the shape a real frame extractor has
    (payload in, many (frame_idx, frame_payload) out).  Frame payload here
    is a deterministic md5 slice standing in for decoded pixels.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame_bytes": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, _, n_frames = _decode_payload(payload)
                for idx in range(0, n_frames, every):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(
                        hashlib.md5(bytes(payload) + idx.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return assets.filter(F.col("modality") == "video").mapInPandas(
        op, schema="asset_id long, frame_idx int, frame_bytes binary"
    )


def _resized_dims(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving clamp of the longer edge to ``max_dim`` (never
    upscales) — the standard thumbnail rule of CLIP/ViT-style preprocessing."""
    longest = max(width, height, 1)
    if longest <= max_dim:
        return width, height
    scale = max_dim / longest
    return max(1, int(width * scale)), max(1, int(height * scale))


def resize_assets(assets: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize image/video payloads so the longer edge is ≤ ``max_dim``.

    Payload-in → payload-out with the SAME ASSET_SCHEMA columns, so the
    operator composes with :func:`extract_metadata` / :func:`sample_frames`
    downstream exactly like a real preprocessing stage.  BMP payloads
    take the REAL path — decode → nearest-neighbor resample → re-encode,
    all inside this Arrow batch loop (:mod:`.codecs`, stdlib+numpy).
    FAKE payloads keep the original byte-exact stand-in (new header dims
    + filler derived from (source payload, target dims)) — the
    ``asset_resize`` oracle pins those bytes.  Either way the output is
    a pure deterministic function of the input.  Audio rows and
    already-small images pass through byte-identical; frame counts are
    preserved.  Row-local, no shuffle: parallelism is input splits.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from big_data_engineering_financial_analysis_spark.operators import codecs

        for pdf in batches:
            out_payload = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                b = bytes(payload)
                if modality == "audio":
                    out_payload.append(b)
                    continue
                width, height, n_frames = _decode_payload(b)
                new_w, new_h = _resized_dims(width, height, max_dim)
                if (new_w, new_h) == (width, height):
                    out_payload.append(b)
                    continue
                bmp = _bmp_header(b)
                if bmp is not None:
                    if bmp[2:] != (24, 0):  # pixels we cannot decode:
                        # fail CLEAN — silently passing an over-size
                        # image or swapping in fake bytes would both
                        # violate the resize contract
                        raise NotImplementedError(
                            f"resize needs a pixel codec: BMP bpp={bmp[2]} "
                            f"compression={bmp[3]} is not 24-bit uncompressed"
                        )
                    out_payload.append(  # REAL path: pixels in, pixels out
                        codecs.encode_bmp(
                            codecs.resize_rgb(codecs.decode_bmp(b), new_w, new_h)
                        )
                    )
                    continue
                if b[:4] != MAGIC:  # e.g. a WAV labeled image/video —
                    # the filler stand-in is FAKE-format-only; writing it
                    # over a real payload would corrupt the asset
                    raise NotImplementedError(
                        "resize needs a pixel codec for this payload format"
                    )
                filler = hashlib.md5(b + struct.pack(">HH", new_w, new_h)).digest() * 4
                out_payload.append(
                    MAGIC + b[4:5] + struct.pack(">HHH", new_w, new_h, n_frames) + filler
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                    "meta": pdf["meta"],
                }
            )

    return assets.mapInPandas(op, schema=ASSET_SCHEMA)


FEATURE_DIM = 64


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic unit-norm vector from payload bytes: md5 in counter
    mode expands the payload digest to ``dim`` floats in [-1, 1), then L2
    normalization.  A pure function of the payload, so byte-identical
    media embed identically — the property the dedup/ANN tests lean on."""
    seed = hashlib.md5(payload).digest()
    raw: list[int] = []
    counter = 0
    while len(raw) < dim:
        block = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        raw.extend(
            int.from_bytes(block[j : j + 4], "big") for j in range(0, 16, 4)
        )
        counter += 1
    vals = [(v / 2**31) - 1.0 for v in raw[:dim]]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-asset feature vectors — the ENCODER stage of a multimodal
    pipeline (CLIP image tower, wav2vec audio, mean-pooled video frames).

    BMP and WAV payloads get REAL content features inside this Arrow
    batch loop (:mod:`.codecs`): block-mean luma pooling for images (the
    average-hash family — a resized copy embeds NEAR its original, the
    property near-dup search needs) and RMS energy envelopes for audio.
    No model weights live in this container, so these are the classical
    non-learned baselines; a CLIP/wav2vec forward pass drops into the
    same dispatch.  FAKE payloads keep :func:`_fake_features`, and so do
    payloads the codecs can't STRICTLY decode (unsupported BMP variants,
    non-PCM WAV, unknown formats) and degenerate flat/empty content —
    the operator is total by design: one stray asset never kills a
    corpus-scale encode job.  Every path honors the downstream contract: fixed ``dim``,
    ``array<float>``, unit L2 norm, identical payloads ⇒ identical
    vectors.  The output column is drop-in for the embedding operators
    (`operators.similarity.cosine_topk`, `embedding_dedup`, IVF/PQ):
    multimodal ingest → encode → similarity search with no schema
    adapter.  Row-local mapInPandas, no shuffle — parallelism is input
    splits, exactly how a GPU-executor encode stage partitions at scale.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from big_data_engineering_financial_analysis_spark.operators import codecs

        def feat(p: bytes) -> list[float]:
            # Conservative dispatch, TOTAL function: only payloads the
            # codecs strictly decode take the real path; everything else
            # (unsupported BMP variants, non-PCM WAV, degenerate flat /
            # empty content where block-mean/RMS features have no
            # direction) falls back to the payload-hash features — one
            # stray asset must never kill a corpus-scale encode job, and
            # byte-identical payloads still embed identically.
            real: list[float] | None = None
            bmp = _bmp_header(p)
            if bmp is not None and bmp[2:] == (24, 0):
                real = codecs.image_features(codecs.decode_bmp(p), dim)
            else:
                wav = _wav_header(p)
                if wav is not None and wav[3] in (1, 2):
                    real = codecs.audio_features(codecs.decode_wav(p)[0], dim)
            return real if real is not None else _fake_features(p, dim)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": [feat(bytes(p)) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(
        op, schema="asset_id long, modality string, feature array<float>"
    )


def payload_stats(assets: DataFrame) -> DataFrame:
    """Pure-relational stats over binary columns (no Python): byte length
    and hex-prefix groupings — proves binary columns behave as first-class
    values in scans/aggregations."""
    return (
        assets.withColumn("n_bytes", F.length("payload").cast("long"))
        .withColumn("magic_hex", F.lower(F.hex(F.substring("payload", 1, 4))))
        .groupBy("modality", "magic_hex")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
