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
    "media_from_documents",
    "extract_image_features",
    "image_feature_rows",
    "sample_video_frames",
    "video_frame_manifest",
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


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents.text`` (the
    utf-8 bytes become the opaque blob). This is the oracle-checkable
    media source: every downstream byte/char computation over it is
    reproducible in ANSI SQL, unlike :func:`synthesize_media`'s RNG
    blobs. Same schema, same downstream operators."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("media"),
        (F.lit(64) + F.col("doc_id") % 128).cast("int").alias("width"),
        (F.lit(64) + F.col("doc_id") % 64).cast("int").alias("height"),
        (F.lit(1000) * (F.col("doc_id") % 30 + 1)).cast("int").alias(
            "duration_ms"
        ),
    )


def image_feature_rows(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """(media_id, dim, value): :func:`extract_image_features` exploded to
    one row per feature dimension with round(.,6) values — a fully
    canonicalizable (scalar-column) shape for cross-engine comparison;
    array columns can't be hashed by the correctness gate."""
    feats = extract_image_features(media, use_stub=use_stub)
    return feats.select(
        "media_id", F.posexplode("features").alias("dim", "v")
    ).select(
        "media_id",
        F.col("dim").cast("int").alias("dim"),
        F.round("v", 6).alias("value"),
    )


def video_frame_manifest(docs: DataFrame, every_ms: int = 5000) -> DataFrame:
    """(media_id, frame_no, frame_md5, frame_len): the frame-sampling fan
    out of :func:`sample_video_frames`, computed over character windows of
    the document text entirely with JVM expressions (sequence/transform/
    substring/md5 — no Python), so it is byte-for-byte reproducible in
    SQL. The binary variant keeps the production UDF shape; this manifest
    is the correctness gate for the fan-out arithmetic (frame count, step,
    window boundaries)."""
    base = docs.where(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        "text",
        (F.lit(1000) * (F.col("doc_id") % 30 + 1)).alias("duration_ms"),
    )
    nf = F.greatest(F.lit(1), F.expr(f"duration_ms div {every_ms}"))
    step = F.greatest(F.lit(1), F.expr("length(text) div _nf"))
    frame = F.expr("substring(text, cast(_fno * _step + 1 as int), cast(_step as int))")
    return (
        base.withColumn("_nf", nf)
        .withColumn("_step", step)
        .select(
            "media_id",
            "text",
            "_step",
            F.explode(F.sequence(F.lit(0), F.col("_nf") - 1)).alias("_fno"),
        )
        .select(
            "media_id",
            F.col("_fno").cast("int").alias("frame_no"),
            F.md5(frame).alias("frame_md5"),
            F.length(frame).cast("long").alias("frame_len"),
        )
    )


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """(media_md5, n_items, min_media_id): exact byte-identical dedup."""
    return media.groupBy(F.md5("media").alias("media_md5")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.min("media_id").alias("min_media_id"),
    )
