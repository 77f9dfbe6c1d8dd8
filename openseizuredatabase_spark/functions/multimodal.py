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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage. Real implementation requires PIL; without it the
    stage raises at plan-build time (NOT mid-job) so callers fail fast."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL, which is not available in this "
            "environment; the mapInPandas contract is identical to "
            "decode_features (binary in, binary out)"
        )
    raise NotImplementedError("real codec path not exercised in this build")


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
