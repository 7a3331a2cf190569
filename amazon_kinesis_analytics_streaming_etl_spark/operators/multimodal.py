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
        # Environment evidence (re-probed 2026-08-16, round 12): PIL, cv2,
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


# --------------------------------------------------------------------------
# round 9: perceptual average-hash (aHash) signatures for image near-dup
# --------------------------------------------------------------------------

AHASH_PX = 64  # 8x8 grayscale thumbnail
AHASH_BANDS = 8  # 8 bands x 8 bits: pigeonhole-exact for hamming <= 7

AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sig", LongType()),
        StructField("bands", ArrayType(IntegerType())),
    ]
)


def synthetic_media_pairs(spark, groups: int = 128) -> DataFrame:
    """Near-duplicate media corpus: ``groups`` base images, each with an
    original (v=0) and a lightly perturbed variant (v=1) — payload text
    ``img-{g}-{v}`` stands in for the encoded bytes. The fake decoder
    below derives pixels from (g, v), flipping ~8% of the variant's
    pixels, so variant pairs are near in aHash space and cross-group
    pairs are ~32 bits apart: the controlled fixture for the perceptual
    dedup pipeline."""
    return spark.range(groups * 2).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat(
                F.lit("img-"),
                (F.col("id") / 2).cast("long").cast("string"),
                F.lit("-"),
                (F.col("id") % 2).cast("string"),
            ),
            "utf-8",
        )
        .cast("binary")
        .alias("payload"),
    )


def _fake_pixels(media_id: int, g: int, v: int) -> list[int]:
    """Deterministic 8x8 grayscale stand-in (same md5 arithmetic the
    DuckDB oracle replays): base pixel from md5('img{g}#{i}'); a v=1
    variant replaces a pixel with noise when the md5-uniform of
    ('noise{media_id}#{i}') is under 0.08."""
    px = []
    for i in range(AHASH_PX):
        h = hashlib.md5(f"img{g}#{i}".encode()).hexdigest()
        p = int(h[:2], 16)
        if v == 1:
            nh = hashlib.md5(f"noise{media_id}#{i}".encode()).hexdigest()
            if int(nh[:8], 16) / 4294967296.0 < 0.08:
                p = int(nh[8:10], 16)
        px.append(p)
    return px


def ahash_signatures(df: DataFrame) -> DataFrame:
    """payload -> 64-bit average-hash signature + LSH bands, via
    mapInPandas (Arrow batches — the real multimodal plumbing; a real
    deployment swaps ``_fake_pixels`` for decode+resize(8x8)+grayscale).

    aHash (the classic perceptual hash): bit_i = pixel_i > mean(pixels).
    Bit i lands at position i of the packed int64 (two's-complement
    wrap); bands are the 8 bytes of the signature, band j = bits
    [8j, 8j+8) — signatures within hamming distance <= 7 MUST share at
    least one exact band (pigeonhole), which makes the banded join an
    exact-recall prefilter at that threshold."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs, bands = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    # undecodable media has no perceptual signature; a
                    # real pipeline routes it to the dead-letter side
                    continue
                _, g, v = payload.decode().split("-")
                px = _fake_pixels(int(mid), int(g), int(v))
                mean = sum(px) / float(AHASH_PX)
                sig = 0
                for i, p in enumerate(px):
                    if p > mean:
                        sig |= 1 << i
                bands.append(
                    [(sig >> (8 * j)) & 255 for j in range(AHASH_BANDS)]
                )
                if sig >= 1 << 63:  # pack into signed int64
                    sig -= 1 << 64
                ids.append(mid)
                sigs.append(sig)
            if ids:  # an all-skipped batch yields nothing (empty numpy
                # columns can't Arrow-convert to list<int>)
                yield pd.DataFrame(
                    {"media_id": ids, "sig": sigs, "bands": bands}
                )

    return df.mapInPandas(run, schema=AHASH_SCHEMA)
