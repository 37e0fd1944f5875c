"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (task brief): image/audio/video payloads travel as ``binary``
columns with a typed metadata struct alongside.  The Spark-side
plumbing — schema, partitioning, Arrow batch shape through
``mapInPandas`` — is real and tested; the actual media decode is
STUBBED (no image/audio libraries in this container): the default
``decode_fn`` raises ``NotImplementedError`` and tests/queries inject
``fake_decode`` (deterministic, derived from the bytes) instead.

At 100 TB, payload columns dominate I/O: keep them in their own
parquet column (never inside JSON), filter on metadata columns first
so pushdown prunes before any payload byte is read, and size
``spark.sql.files.maxPartitionBytes`` for payload-heavy row groups.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import spread

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def synth_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake asset table: each document's text bytes stand
    in for a media payload (schema/partitioning identical to real use)."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
    )


def asset_meta(assets: DataFrame) -> DataFrame:
    """Metadata-only projection — payload column untouched, so the
    parquet reader never materializes it (column pruning)."""
    return assets.select(
        "asset_id",
        "media_type",
        "byte_len",
        (F.col("byte_len") % 640).cast("int").alias("width"),
        ((F.col("byte_len") * 7) % 480).cast("int").alias("height"),
        (F.col("byte_len") % 16 + 1).cast("int").alias("n_frames"),
    )


def real_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Decode a media payload → (width, height, n_frames).

    STUB: real decoding needs PIL/ffmpeg/soundfile, which are not in
    this container.  Production swaps this single function.
    """
    raise NotImplementedError("media decode requires image/audio libraries")


def fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in decode derived purely from the bytes."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 16 + 1


def decode_assets(
    assets: DataFrame,
    decode_fn: Callable[[bytes, str], tuple[int, int, int]] = real_decode,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    The UDF boundary is per-batch (not per-row): each pandas batch
    holds the payload bytes column; decode results come back as a
    narrow typed frame.  This is the one sanctioned Python hop in the
    engine — media codecs have no JVM expression equivalent.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_fn(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    # spread: single-split local sources would otherwise serialize the
    # Python workers behind one task.
    return spread(assets).mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def real_resize(payload: bytes, media_type: str, w: int, h: int) -> bytes:
    """Resize an image payload to (w, h).  STUB: needs PIL/libvips —
    not in this container.  Production swaps this single function."""
    raise NotImplementedError("image resize requires an imaging library")


def fake_resize(payload: bytes, media_type: str, w: int, h: int) -> bytes:
    """Deterministic stand-in: tile/truncate the payload to w*h bytes
    (same output cardinality/shape a real thumbnail would have)."""
    need = w * h
    reps = (need + max(len(payload), 1) - 1) // max(len(payload), 1)
    return (payload * max(reps, 1))[:need]


def resize_assets(
    assets: DataFrame,
    width: int = 8,
    height: int = 8,
    resize_fn: Callable[[bytes, str, int, int], bytes] = real_resize,
) -> DataFrame:
    """Arrow-batched thumbnailing via mapInPandas (image assets only —
    the media_type filter happens BEFORE the Python hop, so pushdown
    prunes non-image row groups and their payload bytes)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "thumb": [
                        resize_fn(bytes(p), m, width, height)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    images = assets.filter(F.col("media_type").startswith("image/"))
    return spread(images).mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    every_n: int = 4,
    decode_fn: Callable[[bytes, str], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video asset — a
    fan-out mapInPandas (rows out > rows in), the batch shape real
    frame extraction (ffmpeg) would use.  Frame bytes here are
    deterministic payload slices; production swaps the slicer."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p, m in zip(pdf["asset_id"], pdf["payload"], pdf["media_type"]):
                raw = bytes(p)
                _, _, n_frames = decode_fn(raw, m)
                span = max(len(raw) // max(n_frames, 1), 1)
                for f in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(f)
                    frames.append(raw[f * span : (f + 1) * span])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    videos = assets.filter(F.col("media_type").startswith("video/"))
    return spread(videos).mapInPandas(frame_batches, schema=FRAME_SCHEMA)
