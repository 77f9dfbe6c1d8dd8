"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for a 100 TB training-data lake:
* content is a ``binary`` column (Parquet stores it chunked + compressed);
  metadata is a typed struct so predicates (media_type, width, duration)
  prune at the scan without touching bytes.
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes never pass through the driver and flow
  batch-wise through Python only where a real codec is required.
* the actual codecs (PIL/opencv/librosa) are NOT in this environment, so
  the decode kernel is gated behind an import-try with a deterministic
  stub fallback (content-hash-derived pseudo pixels/samples). The Spark
  plumbing — schemas, batch iteration, partitioning — is real and tested;
  swapping the stub for a codec changes one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

try:  # pragma: no cover - codec not present in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _stub_decode(content: bytes, n: int = 64) -> np.ndarray:
    """Deterministic fake decoder: derive n pseudo-samples in [0, 1) from
    the content hash. Stands in for a real codec (marked clearly; the
    Spark-side contract — bytes in, float vector out — is identical)."""
    if content is None:
        return np.zeros(n)
    h = hashlib.sha256(content).digest()
    rng = np.frombuffer((h * ((n * 4) // len(h) + 1))[: n * 4], dtype=np.uint32)
    return (rng % 10_000) / 10_000.0


def decode_features(
    media: DataFrame, n_features: int = 64, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract stage: binary → array<double> features.

    One mapInPandas pass; only (media_id, content) cross the Arrow
    boundary (project before the UDF — pushdown stops at opaque stages).
    """
    out_schema = "media_id long, features array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _stub_decode(c, n_features).tolist() for c in pdf["content"]
            ]
            n_bytes = [len(c) if c is not None else 0 for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "features": feats,
                    "n_bytes": n_bytes,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, out_schema)


# --- real PNG codec (stdlib-only: struct + zlib) ---------------------------
#
# One honest codec path among the stubbed ones: PNG is fully decodable
# with nothing but zlib inflate + per-scanline unfiltering, so the
# "image decode" stage can be REAL here, not a deterministic fake.
# Supports 8-bit greyscale (color type 0), RGB (2) and RGBA (6),
# non-interlaced — the overwhelming majority of training-corpus PNGs.
# Palette and Adam7 fail fast with a clear message.

import struct
import zlib


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(content: bytes) -> np.ndarray:
    """Decode a PNG to a (height, width, channels) uint8 array.

    Pure stdlib: chunk walk → IHDR parse → concatenated-IDAT zlib
    inflate → per-scanline unfilter (None/Sub/Up/Average/Paeth, the
    full PNG filter set). The unfilter loop is per-scanline numpy
    (vectorized where the filter allows: Up is a whole-row add; Sub/
    Average/Paeth carry a per-pixel dependency and run at C-int speed
    over a row buffer)."""
    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG color type {color_type} (palette PNGs not supported)"
        )
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNGs not supported")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        row0 = y * (stride + 1)
        f = raw[row0]
        line = np.frombuffer(
            raw[row0 + 1 : row0 + 1 + stride], dtype=np.uint8
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth: per-pixel left-dependency
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    cur[i] = (line[i] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(
    arr: np.ndarray, filters: "list[int] | None" = None
) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a PNG.

    ``filters`` optionally forces the filter type per scanline (0-4);
    default None-filters every line. Forcing a y%5 rotation exercises
    the decoder's full unfilter matrix — the m20 oracle relies on that
    round-trip."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)] if filters else 0
        line = flat[y]
        if f == 0:
            enc = line
        elif f == 2:
            enc = (line - prev) & 0xFF
        else:
            enc = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                va = line[i - ch] if i >= ch else 0
                vb = prev[i]
                vc = prev[i - ch] if i >= ch else 0
                if f == 1:
                    enc[i] = (line[i] - va) & 0xFF
                elif f == 3:
                    enc[i] = (line[i] - ((va + vb) >> 1)) & 0xFF
                elif f == 4:
                    enc[i] = (line[i] - _paeth(va, vb, vc)) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def png_pixel_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Real image-decode stage: PNG binary → per-image pixel statistics
    through the stdlib decoder, one Arrow batch at a time (bytes never
    on the driver). Non-PNG rows fail fast — this is the honest codec
    path, not the stub."""
    out_schema = (
        f"{id_col} long, width long, height long, channels long, "
        "n_px long, px_sum long, px_min long, px_max long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                img = decode_png(bytes(content))
                h, w, ch = img.shape
                ii = img.astype(np.int64)
                rows.append(
                    (mid, w, h, ch, int(img.size), int(ii.sum()),
                     int(ii.min()), int(ii.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "channels",
                    "n_px", "px_sum", "px_min", "px_max",
                ],
            )

    return media.select(id_col, "content").mapInPandas(run, out_schema)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w, c) array to (height, width,
    c): output pixel (i, j) reads input (floor(i*h_in/height),
    floor(j*w_in/width)) — pure integer index arithmetic, so the result
    is exactly replayable in SQL (the m21 oracle)."""
    h_in, w_in = img.shape[:2]
    rows = (np.arange(height) * h_in) // height
    cols = (np.arange(width) * w_in) // width
    return img[rows[:, None], cols[None, :]]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage over PNG content — REAL now that the stdlib codec
    exists: decode → nearest-neighbor resample → re-encode, one
    mapInPandas pass, binary in / binary out (the PIL-style contract;
    swapping in PIL's area/bicubic filters would change only the
    resample call, not the stage shape)."""
    out_schema = "media_id long, content binary, width long, height long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_png(bytes(content))
                small = resize_nearest(img, width, height)
                rows.append((mid, encode_png(small), width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    return media.select("media_id", "content").mapInPandas(run, out_schema)


# --- WAV (RIFF PCM) decode: the audio analogue of the PNG path -------------


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE file to (samples int array (n, channels),
    sample_rate). Pure stdlib struct walk; PCM 16-bit and 8-bit
    supported (the formats the reference's phone exports use);
    float/ADPCM encodings fail fast."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} (only PCM=1 supported)"
        )
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bits == 8:  # unsigned, offset-128 per the RIFF spec
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise NotImplementedError(f"WAV bit depth {bits} (8/16 supported)")
    n = (len(samples) // n_ch) * n_ch
    return samples[:n].reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode an (n,) or (n, channels) int array as PCM-16 RIFF/WAVE.

    Out-of-range samples are clipped to [-32768, 32767] (standard PCM
    saturation) — a bare int16 cast would silently WRAP them (numpy
    modular overflow), corrupting the audio while decode_wav round-trips
    would still "validate" the wrong data.
    """
    s = np.clip(
        np.asarray(samples), -32768, 32767
    ).astype(np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_sample_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Real audio-decode stage: WAV binary → per-clip sample statistics
    (Arrow-batched, bytes never on the driver)."""
    out_schema = (
        f"{id_col} long, sample_rate long, n_samples long, channels long, "
        "s_sum long, s_min long, s_max long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                s, rate = decode_wav(bytes(content))
                rows.append(
                    (mid, rate, s.shape[0], s.shape[1],
                     int(s.sum()), int(s.min()), int(s.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_samples", "channels",
                    "s_sum", "s_min", "s_max",
                ],
            )

    return media.select(id_col, "content").mapInPandas(run, out_schema)


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling stage: emits one row per sampled frame index
    (UDTF shape — row-expanding like W5/M6). Frame DECODE is stubbed; the
    index arithmetic, metadata carry-through and fan-out are real."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.explode(
        F.slice(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)),
            1,
            max_frames,
        )
    ).alias("frame_idx")
    return (
        media.filter((F.col("media_type") == "video") & (n > 0))
        .select("media_id", idx, F.col("meta.format").alias("format"))
    )
