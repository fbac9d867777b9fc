"""Real, dependency-free media codecs: BMP (24-bit uncompressed) and
WAV (PCM), pure stdlib ``struct``/``wave`` + numpy.

These close the "real codec" half of the multimodal boundary: the
container has no PIL/ffmpeg, but uncompressed formats need none —
BMP is a fixed header + padded BGR rows, WAV is RIFF framing the
stdlib ``wave`` module already speaks.  ``operators/multimodal.py``
dispatches on payload magic: ``BM``/``RIFF..WAVE`` payloads take these
REAL paths (decode → transform pixels/samples → re-encode), the
deterministic FAKE format keeps its original byte-exact path (the
``asset_resize`` oracle depends on it), and compressed/container
formats (JPEG/PNG/MP3/MP4) remain the documented external-codec
boundary.

Everything here is a pure function of the payload bytes — the property
the downstream dedup/ANN/oracle machinery leans on.

Reference note: the reference system has no media handling at all
(its payloads are JSON candle rows end-to-end); this family exists for
the training-data-pipeline extension surface (SURVEY §2.12 M1-M2).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

#: BMP constants: 14-byte file header + 40-byte BITMAPINFOHEADER.
_BMP_DATA_OFFSET = 54


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up, BGR, rows padded to 4 bytes — the baseline every viewer
    reads)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {rgb.shape}")
    h, w = rgb.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    # BGR, bottom-up, padded
    bgr = rgb[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_DATA_OFFSET + img_size, 0, 0, _BMP_DATA_OFFSET
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (H, W, 3) uint8 RGB
    array.  Supports the baseline this module writes plus top-down rows
    (negative height); anything compressed or non-24-bit raises."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def resize_rgb(rgb: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, 3) array to (new_h, new_w).
    Deterministic integer index map — the same pixels on every engine,
    which keeps resized payloads a pure function of the input."""
    h, w = rgb.shape[:2]
    yi = (np.arange(new_h) * (h / new_h)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(new_w) * (w / new_w)).astype(np.int64).clip(0, w - 1)
    return rgb[yi][:, xi]


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, channels) — as
    a RIFF/WAVE payload via the stdlib ``wave`` module."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to ((n, channels) int16 samples,
    sample_rate).  8-bit input is widened to int16 so callers see one
    dtype; compressed WAV raises inside ``wave``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(n)
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2")
    elif width == 1:  # unsigned 8-bit -> centered int16
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise NotImplementedError(f"sample width {width} not supported")
    return s.reshape(-1, ch), rate


def image_features(rgb: np.ndarray, dim: int) -> list[float] | None:
    """REAL content features for an image: ``g x g`` block-mean luma
    pooling (g = ceil(sqrt(dim)), truncated to ``dim``) → mean-centered
    → L2-normalized.  The classical average-hash family: identical
    images embed identically, and a resized copy embeds NEARBY (the
    property near-dup search needs), because block means are stable
    under resampling.

    Returns ``None`` for DEGENERATE flat content (a solid-color image
    centers to the zero vector, which has no direction) — the caller
    decides the fallback (multimodal uses the payload-hash features, so
    byte-identical flat duplicates still pair at cosine 1.0).

    Luma is computed AFTER nearest-neighbor subsampling to the g*8 grid
    — identical values (indexing commutes with the per-pixel luma), a
    fraction of the float work on large frames."""
    g = int(np.ceil(dim**0.5))
    small = resize_rgb(rgb, g * 8, g * 8).astype(np.float64)
    luma = 0.299 * small[:, :, 0] + 0.587 * small[:, :, 1] + 0.114 * small[:, :, 2]
    blocks = luma.reshape(g, 8, g, 8).mean(axis=(1, 3)).ravel()[:dim]
    centered = blocks - blocks.mean()
    norm = float(np.sqrt((centered**2).sum()))
    if norm < 1e-9:
        return None
    return [float(v) for v in centered / norm]


def audio_features(samples: np.ndarray, dim: int) -> list[float] | None:
    """REAL content features for audio: channel-mean → ``dim`` equal
    time bins → per-bin RMS energy → log1p → mean-centered →
    L2-normalized.  The classical energy-envelope baseline: trim/pad
    stable, identical payloads embed identically.

    Returns ``None`` for DEGENERATE content — empty or constant-energy
    (e.g. silent) audio centers to the zero vector; the caller picks the
    fallback (multimodal: payload-hash features)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.size == 0:
        return None
    mono = s.reshape(s.shape[0], -1).mean(axis=1)
    n = len(mono)
    edges = (np.arange(dim + 1) * (n / dim)).astype(np.int64)
    rms = np.array(
        [
            float(np.sqrt((mono[a:b] ** 2).mean())) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )
    vals = np.log1p(rms)
    centered = vals - vals.mean()
    norm = float(np.sqrt((centered**2).sum()))
    if norm < 1e-9:
        return None
    return [float(v) for v in centered / norm]
