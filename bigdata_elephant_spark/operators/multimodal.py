"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed
metadata struct alongside — the pattern that scales: the 100 TB of
bytes stay columnar and compressed in parquet, metadata predicates
(format/width/duration) prune row groups *without touching payload
bytes*, and per-record decode runs as Arrow-batched pandas functions
via ``mapInPandas`` (one Python process per partition, zero
driver involvement).

The decode step itself is STUBBED: the runtime image/audio libs are
not in this container, so ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-seeded feature vector. Everything around the stub
— schemas, batch iteration, partitioning, output shapes — is real
and tested; swapping in PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary payload + metadata from text —
    test plumbing for environments with no real media files."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        id_col,
        payload.alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.octet_length(payload) % 640).cast("int").alias("width"),
            (F.octet_length(payload) % 480).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim).astype(np.float32)]


def decode_media(
    df: DataFrame,
    fake: bool = False,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """binary payloads -> fixed-size feature vectors via mapInPandas.

    Arrow ships each partition to Python in batches; the iterator
    form keeps memory bounded regardless of partition size. With
    ``fake=False`` this is the integration point for a real decoder
    (PIL / ffmpeg / torchaudio) — not available in this container.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg/torchaudio, which are "
            "not installed here; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "feature": [
                        _fake_features(bytes(b)) for b in pdf[media_col]
                    ],
                    "n_bytes": pdf[media_col].map(len).astype("int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_crc", LongType()),
    ]
)


def frame_sample(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 4,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from each payload.

    The video-pipeline shape: one input row fans out to many frame
    rows (``mapInPandas`` may return more rows than it receives —
    the Arrow-batched equivalent of a generate/explode). A real
    decoder replaces the byte-slicing with container-aware frame
    extraction; partitioning, batch iteration, and the fan-out
    contract are identical.
    """
    import zlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, crcs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(payload)
                n_frames = (len(raw) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    chunk = raw[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    crcs.append(zlib.crc32(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_crc": pd.Series(crcs, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def resize_media(
    df: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize plumbing: payload -> payload of the target dimensions.

    The fake "resampler" truncates/cycles bytes to ``w*h`` — a real
    implementation swaps in PIL/ffmpeg scaling per record; schema
    (binary out + updated metadata struct), Arrow batching, and
    1-in-1-out row contract are identical. Runs in ``mapInPandas``
    so decoder state could be reused across a partition's records.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in it:
            payloads = []
            for b in pdf[media_col]:
                raw = bytes(b)
                if not raw:
                    payloads.append(b"\x00" * size)
                elif len(raw) >= size:
                    payloads.append(raw[:size])
                else:
                    reps = (size + len(raw) - 1) // len(raw)
                    payloads.append((raw * reps)[:size])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return df.select(id_col, media_col).mapInPandas(batches, schema=schema)


def media_summary(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so
    parquet column pruning skips the heavy column entirely."""
    return (
        df.select("meta.format", F.octet_length("media").alias("nb"))
        .groupBy("format")
        .agg(
            F.count("*").alias("n"),
            F.sum("nb").alias("total_bytes"),
        )
    )
