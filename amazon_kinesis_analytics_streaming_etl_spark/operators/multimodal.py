"""Multimodal column plumbing — image/audio/video as opaque binary columns.

Design: media payloads travel as ``binary`` columns with a typed metadata
struct alongside; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched pandas functions over ``mapInPandas`` (per-batch Python,
never per-row). The Spark-side plumbing — schemas, batch iteration,
partition parallelism — is real and tested; the *codec* step is stubbed
behind ``DecodeBackend`` because no image/audio library ships in this
container. Swapping in PIL/ffmpeg later changes one function, not the
plan.

At 100 TB: media rows are large, so the operators avoid shuffles entirely
(mapInPandas is a narrow transformation); control parallelism with input
file splits, and keep ``spark.sql.files.maxPartitionBytes`` small enough
that a partition of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


class DecodeBackend:
    """Codec seam. ``deterministic_fake`` keeps tests hermetic; a real
    deployment provides e.g. a PIL-backed implementation with the same
    signature."""

    @staticmethod
    def deterministic_fake(payload: bytes) -> tuple[int, int, str]:
        """(width, height, digest) derived only from the bytes — stable
        across runs/partitionings."""
        digest = hashlib.md5(payload or b"").hexdigest()
        width = 16 + int(digest[:4], 16) % 1024
        height = 16 + int(digest[4:8], 16) % 1024
        return width, height, digest

    @staticmethod
    def real(payload: bytes) -> tuple[int, int, str]:  # pragma: no cover
        # Environment evidence (re-probed 2026-08-15, round 9): PIL, cv2,
        # soundfile, av all raise ModuleNotFoundError and no ffmpeg binary
        # is on PATH, so the real codec stays a documented seam; the
        # deterministic fake keeps every downstream stage oracle-gated.
        raise NotImplementedError(
            "No image/audio codec library in this environment; plug a "
            "PIL/ffmpeg-backed decoder in here."
        )


def decode_media(
    df: DataFrame, decode: Callable[[bytes], tuple[int, int, str]] | None = None
) -> DataFrame:
    """Decode dimensions/digest from payload bytes via mapInPandas
    (Arrow batches; Python cost amortized per batch, not per row)."""
    decode = decode or DecodeBackend.deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_digest": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Fixed-dim feature vector per media row (deterministic fake codec:
    md5-seeded floats). The plumbing — Arrow batches, array<float> output,
    downstream compatibility with the similarity operators — is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.md5(p if p is not None else b"").digest()
                feats.append([b / 255.0 for b in digest[:FEATURE_DIM]])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_media(
    df: DataFrame,
    max_dim: int = 256,
    resize: Callable[[bytes, int], tuple[bytes, int, int]] | None = None,
) -> DataFrame:
    """Resize each media payload so its longest side is ``max_dim``,
    preserving aspect ratio — mapInPandas over Arrow batches, binary in /
    binary out (the shape a thumbnailing or model-preprocessing stage
    needs). The fake codec derives dimensions from the content digest and
    'resizes' by passing bytes through; a PIL-backed ``resize(payload,
    max_dim) -> (bytes, w, h)`` drops in without touching the plan."""

    def fake(payload: bytes, cap: int) -> tuple[bytes, int, int]:
        w, h, _ = DecodeBackend.deterministic_fake(payload)
        scale = min(1.0, cap / max(w, h))
        return payload, max(1, int(w * scale)), max(1, int(h * scale))

    resize = resize or fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize(p if p is not None else b"", max_dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [o[0] for o in out],
                    "width": [o[1] for o in out],
                    "height": [o[2] for o in out],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame timestamp,
    derived from metadata duration (JVM-side sequence/explode — the decode
    of actual frame bytes is the stubbed codec step)."""
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0).cast("long")),
                F.lit(int(every_ms)).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
    return frames.where(F.col("frame_ts_ms").isNotNull())


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes are a
    function of media_id)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8")
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("id") * 997 % 10000).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )
    return base
