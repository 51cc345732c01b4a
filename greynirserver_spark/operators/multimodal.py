"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media lives as opaque ``binary`` columns with typed metadata, exactly like
the ``pages.html`` binary column: Spark moves the bytes, Arrow batches
them into Python, and a vectorized UDF does the per-item work. The decode
step itself (PIL/ffmpeg/torchaudio) is NOT available in this container, so
it is stubbed behind a clearly-marked seam (``_decode_image`` raises
``NotImplementedError`` unless a decoder is importable; tests exercise the
deterministic fake). Everything Spark-side — schema, batch shape,
partitioning, the UDF contract — is real and tested.

Operators:

* :func:`media_table_schema` / :func:`synthesize_media` — the canonical
  media table: (media_id, kind, media binary, meta struct).
* :func:`extract_image_features` — mapInPandas: bytes -> fixed-size
  float feature vector (stubbed decode -> deterministic content-hash
  features; swap ``_decode_image`` for a real decoder in production).
* :func:`sample_video_frames` — frame-sampling plumbing: one input row
  fans out to N (media_id, frame_no, frame binary) rows; frame extraction
  is byte-slicing in the stub, ffmpeg in production.
* :func:`dedup_media_exact` — md5 over bytes (engine-portable hash).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "synthesize_media",
    "extract_image_features",
    "sample_video_frames",
    "dedup_media_exact",
]

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, "
    "width int, height int, duration_ms int"
)

_FEATURE_DIM = 16


def _decoder_available() -> bool:
    try:  # pragma: no cover - decoder not present in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image(data: bytes) -> "np.ndarray":
    """Decode image bytes to an HxWx3 array. STUB: no image codec is
    installed in this environment; production swaps in PIL/torchvision."""
    if _decoder_available():  # pragma: no cover
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        "image decoding requires PIL/torchvision (not in this container); "
        "feature extraction falls back to deterministic content-hash "
        "features via use_stub=True"
    )


def synthesize_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table (seed from media_id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.Generator(np.random.SFC64([42, 7, i]))
                kind = ("image", "audio", "video")[i % 3]
                blob = rng.integers(0, 256, size=256 + (i % 512),
                                    dtype=np.uint8).tobytes()
                rows.append(
                    (i, kind, blob, 64 + (i % 128), 64 + (i % 64),
                     1000 * (1 + i % 30))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "media", "width",
                               "height", "duration_ms"],
            )

    return spark.range(0, n, 1, max(2, n // 50)).mapInPandas(gen, MEDIA_SCHEMA)


def extract_image_features(
    media: DataFrame, use_stub: bool = True
) -> DataFrame:
    """(media_id, features array<float>): Arrow-batched feature extraction.

    Stub features are md5-derived (deterministic, engine-portable): 16
    floats in [0,1). The Spark plumbing — kind filter pushdown, batch
    iteration, fixed-dim array output — is identical to the real path.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_f = []
            for data in b["media"]:
                if not use_stub:  # pragma: no cover
                    arr = _decode_image(bytes(data))
                    v = arr.mean(axis=(0, 1)).astype(np.float64)
                    v = np.resize(v / 255.0, _FEATURE_DIM)
                else:
                    h = hashlib.md5(bytes(data)).digest()
                    v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
                    v = (v / 255.0)[:_FEATURE_DIM]
                out_f.append(v.tolist())
            yield pd.DataFrame(
                {"media_id": b["media_id"], "features": out_f}
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "media")
        .mapInPandas(feats, "media_id long, features array<double>")
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 5000, use_stub: bool = True
) -> DataFrame:
    """Fan out each video to sampled frames: (media_id, frame_no, frame).

    One row in, N rows out — the UDTF shape of the reference's tree
    processors (processor.py:152-278). Frame bytes are byte-window slices
    in the stub; production replaces the slicer with an ffmpeg seek.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, nos, blobs = [], [], []
            for mid, data, dur in zip(
                b["media_id"], b["media"], b["duration_ms"]
            ):
                data = bytes(data)
                n_frames = max(1, int(dur) // every_ms)
                step = max(1, len(data) // n_frames)
                for fno in range(n_frames):
                    ids.append(int(mid))
                    nos.append(fno)
                    blobs.append(data[fno * step: fno * step + step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": blobs}
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "media", "duration_ms")
        .mapInPandas(frames, "media_id long, frame_no int, frame binary")
    )


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """(media_md5, n_items, min_media_id): exact byte-identical dedup."""
    return media.groupBy(F.md5("media").alias("media_md5")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.min("media_id").alias("min_media_id"),
    )
