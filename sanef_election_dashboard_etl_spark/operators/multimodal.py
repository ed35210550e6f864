"""Multimodal column plumbing: opaque binary media + typed metadata.

North-star extension: treat image/audio/video as `binary` columns with a
typed metadata struct, processed by Arrow-batched pandas functions via
`mapInPandas`. The decode step itself is STUBBED (no image/audio libs in
this container): `decode_image` raises NotImplementedError unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested.

At 100 TB: media bytes dominate row size, so the operators (a) never
shuffle the binary column (feature extraction is a narrow map), (b) select
metadata-only columns wherever possible so Parquet column pruning skips the
bytes entirely, and (c) emit fixed-size feature vectors whose downstream
joins/aggregations shuffle only the small derived columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("payload", BinaryType(), True),        # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("payload_bytes", LongType(), False),
    StructField("payload_sha256", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),  # fixed 16-dim
])


def decode_image(payload: bytes) -> "object":
    """Real decoder entry point — requires an image library.

    STUB: this container ships no codec libraries; production swaps in
    PIL/torchvision here. The Spark plumbing around it is fully functional
    with the deterministic fake (`fake=True` in extract_features)."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; use extract_features(..., fake=True) for the "
        "deterministic test double")


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding: bytes of
    sha256(payload) scaled to [0, 1). Stable across runs and machines."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def synthesize_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents fixture: text bytes
    stand in for encoded payloads (deterministic). Metadata is derived
    per-row in codegen."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(64)) * 16 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) * 16 + 64).cast("int").alias("height"),
        F.lit(16_000).cast("int").alias("sample_rate"),
        (F.length("text") % 1000).cast("int").alias("n_frames"),
    )


def extract_features(media: DataFrame, fake: bool = True,
                     batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas: each task streams Arrow batches, decodes (stub), and emits
    FEATURE_SCHEMA rows — the narrow map keeps the big binary column from
    ever shuffling; only the 16-float feature moves downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # production path: decode_image / audio resample / frame
                # sampling per media_type
                raise NotImplementedError("no codec libraries in container")
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                "payload_sha256": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()),
                "feature": payloads.map(_fake_feature),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — selects no binary column, so the Parquet
    reader prunes the payload bytes entirely (ReadSchema check in tests)."""
    return (media.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
                 F.max("n_frames").alias("max_frames")))


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("out_width", IntegerType(), False),
    StructField("out_height", IntegerType(), False),
    StructField("resized", BinaryType(), False),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224, fake: bool = True) -> DataFrame:
    """Resize plumbing: narrow mapInPandas over the payload, one output
    row per input. STUB decode (no codec libs): the deterministic fake
    'resized image' is sha256(payload || dims) repeated to a size-
    proportional byte budget — stable, and downstream schema/partitioning
    behave exactly as a real resize (bytes shrink, metadata updates)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no codec libraries in container")
            tag = f"|{width}x{height}".encode()
            budget = max(16, (width * height) // 4096)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "out_width": width,
                "out_height": height,
                "resized": pdf["payload"].map(
                    lambda p: (hashlib.sha256((p or b"") + tag).digest()
                               * (budget // 32 + 1))[:budget]),
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8,
                  fake: bool = True) -> DataFrame:
    """Frame sampling plumbing: one input row -> up to `max_frames` output
    rows (the row-expanding UDF shape a video pipeline needs). Frame count
    derives from the n_frames metadata; frame bytes are deterministic
    fakes keyed by (payload, index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no codec libraries in container")
            ids, idxs, frames = [], [], []
            for mid, payload, n_frames in zip(
                    pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                n = min(max_frames, max(0, int(n_frames)) // every_n + 1)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i * every_n)
                    frames.append(hashlib.sha256(
                        (payload or b"") + f"|frame{i * every_n}".encode()
                    ).digest())
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs,
                                "frame": frames})

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
