"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The decode step is STUBBED — this container has no image/audio codecs
(no PIL/opencv/ffmpeg). The stub policy:

- If a real codec import succeeds (``PIL``), ``decode_media`` raises
  ``NotImplementedError`` for formats we haven't wired rather than
  silently faking — the seam where a real decoder plugs in.
- Otherwise it produces a DETERMINISTIC FAKE decode (normalized
  byte-histogram "pixels" derived from the payload), clearly labeled
  via ``decoder='fake-histogram-v1'`` in the output, so the
  Spark-side plumbing — schema, Arrow batch shape, partition
  behavior, UDF signatures — is real and testable end-to-end.

Scale notes: media payloads ride as parquet binary; ``mapInPandas``
streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory
holds one batch of payloads, not a partition; per-row Python work is
vectorized numpy over the batch. Frame sampling is pure column math
(``sequence``/``explode``) — the expensive decode only ever sees the
sampled frames.
"""

from __future__ import annotations

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

FEATURE_DIM = 32  # byte-histogram buckets in the fake decoder

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),  # opaque payload
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),  # 1 for stills
        StructField("sample_rate", IntegerType()),  # audio only, else null
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("decoder", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _codec_available() -> bool:
    try:  # pragma: no cover - container has no codecs
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: each document's utf-8 bytes become
    an opaque payload with plausible typed metadata (media_type cycles
    by doc_id). Stands in for a real binary ingest so the pipeline is
    testable without codec libraries."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.when(mt != "audio", F.lit(64)).cast("int").alias("width"),
        F.when(mt != "audio", F.lit(64)).cast("int").alias("height"),
        F.when(mt == "video", (F.col("doc_id") % 7 + 2))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("n_frames"),
        F.when(mt == "audio", F.lit(16_000)).cast("int").alias("sample_rate"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized fake decode: 32-bucket normalized byte histogram."""
    feats = []
    for payload in pdf["content"]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            feats.append(np.zeros(FEATURE_DIM, dtype=np.float32))
            continue
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        feats.append((hist / arr.size).astype(np.float32))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "decoder": "fake-histogram-v1",
            "n_bytes": pdf["content"].map(len).astype("int64"),
            "features": feats,
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas``.

    Real plumbing, stubbed codec: with a codec lib present this is the
    place a real decoder goes (and unwired formats raise
    ``NotImplementedError`` loudly); without one, the deterministic
    fake keeps schema/batching/partitioning exercised end-to-end."""
    use_real = _codec_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:  # pragma: no cover - no codecs in container
                raise NotImplementedError(
                    "real codec decode not wired; only the fake-histogram "
                    "decoder is implemented in this environment"
                )
            yield _fake_decode_batch(pdf)

    cols = ["media_id", "media_type", "content"]
    return media.select(*cols).mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, features array<float>) — the embedding-ingest shape
    the similarity tier consumes."""
    return decode_media(media).select("media_id", "features")


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every-k-th frame index (frame 0 always
    kept). Pure column math — the decode stub above then runs on the
    sampled frames only, which is the 100 TB-relevant property: frame
    selection never touches the payload bytes."""
    vids = media.filter(F.col("media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    return vids.select(
        "media_id",
        F.col("n_frames"),
        F.explode(idx).alias("frame_index"),
        "content",
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resizer", StringType()),
        StructField("content", BinaryType()),
    ]
)


def resize_media(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stills/frames so the longer side is ``max_side``
    (aspect-preserving, never upscales) via ``mapInPandas``.

    Same stub policy as ``decode_media``: with a codec lib present
    this is where a real resampler goes (unwired formats raise
    ``NotImplementedError`` loudly); without one, a DETERMINISTIC
    FAKE "resize" strides the payload bytes down by the same ratio a
    real resampler would apply to pixels (labeled
    ``resizer='fake-stride-v1'``), so the metadata math (aspect
    ratio, no-upscale clamp) and the Spark-side plumbing — schema,
    Arrow batching, binary-out column — are real and tested. Audio
    rows pass through untouched (resize is a pixel concept)."""
    use_real = _codec_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:  # pragma: no cover - no codecs in container
                raise NotImplementedError(
                    "real resampler not wired; only the fake-stride "
                    "resizer is implemented in this environment"
                )
            out_w, out_h, payloads = [], [], []
            for w, h, payload in zip(pdf["width"], pdf["height"], pdf["content"]):
                if pd.isna(w) or pd.isna(h):  # audio: no pixel grid
                    out_w.append(None)
                    out_h.append(None)
                    payloads.append(payload)
                    continue
                scale = min(1.0, max_side / max(int(w), int(h)))
                nw, nh = max(1, round(int(w) * scale)), max(1, round(int(h) * scale))
                out_w.append(nw)
                out_h.append(nh)
                stride = max(1, int(round(1 / scale))) if scale < 1.0 else 1
                payloads.append(bytes(payload[::stride]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                    "resizer": "fake-stride-v1",
                    "content": payloads,
                }
            )

    cols = ["media_id", "media_type", "width", "height", "content"]
    return media.select(*cols).mapInPandas(run, schema=RESIZED_SCHEMA)
