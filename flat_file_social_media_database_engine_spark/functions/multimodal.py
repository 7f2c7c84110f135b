"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

Codec policy (round-3: ALL THREE modalities are REAL codec paths,
using public formats parseable with the stdlib alone — no pixel/audio
third-party library exists in this container, and none is needed):

- **Audio — RIFF/WAVE PCM.** Fixture audio payloads are genuine WAV
  files (44-byte canonical header written with ``struct``);
  ``decode_media`` parses the header back field by field (magics
  validated) and computes a real 32-bin histogram over the decoded
  int16 samples.
- **Image — netpbm P6 (PPM).** Fixture images are genuine binary
  PPMs; the parser implements the real netpbm grammar (ASCII header
  tokens separated by arbitrary whitespace, ``#`` comments, single
  whitespace byte before the raster) — any netpbm consumer can read
  our output and we can read theirs.
- **Video — multi-image PPM stream.** The netpbm spec explicitly
  allows a file to contain several images back to back; a "video" is
  that: ``n_frames`` P6 images concatenated. Decode parses every
  frame; ``sample_frames`` exploits the writer's uniform frame size
  to slice frames JVM-side with pure column math (no Python touches
  the payload until after frame selection).

A payload that is not valid WAV/PPM raises ``ValueError`` — there is
no silent fake left. Formats beyond these (JPEG, MP4, ...) raise
``NotImplementedError`` loudly at the modality dispatch: that is the
documented seam where a container with real pixel codecs would wire
PIL/ffmpeg into the same ``mapInPandas`` batch loop.

Scale notes: media payloads ride as parquet binary; ``mapInPandas``
streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory
holds one batch of payloads, not a partition; per-row Python work is
vectorized numpy over the batch. Frame sampling is pure column math
(``sequence``/``explode`` + byte-offset ``substring``) — the
expensive decode only ever sees the sampled frames.
"""

from __future__ import annotations

import struct
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

FEATURE_DIM = 32  # histogram buckets (PCM samples / pixel bytes)

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
        StructField("width", IntegerType()),  # pixel: parsed from header
        StructField("height", IntegerType()),  # pixel: parsed from header
        StructField("n_frames", IntegerType()),  # pixel: frames counted
        StructField("sample_rate", IntegerType()),  # audio: parsed
        StructField("n_channels", IntegerType()),  # audio: parsed
        StructField("bits_per_sample", IntegerType()),  # audio: parsed
        StructField("n_samples", LongType()),  # audio: data_len / block_align
        StructField("features", ArrayType(FloatType())),
    ]
)

WAV_SAMPLE_RATE = 16_000
_WAV_HEADER_LEN = 44  # canonical RIFF + fmt(16) + data header

IMG_WIDTH = 64  # fixture raster width (pixels); 3 bytes per pixel
_BYTES_PER_ROW = IMG_WIDTH * 3


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM) — real audio codec
# ---------------------------------------------------------------------------
def wav_encode(data: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Wrap raw bytes as a REAL canonical WAV file (RIFF little-endian,
    16-bit mono PCM): 44-byte header written with stdlib ``struct``,
    data padded to whole 2-byte samples. Readable by any WAV consumer
    (the test suite verifies with stdlib ``wave``)."""
    if len(data) % 2:
        data = data + b"\x00"  # pad to int16 sample boundary
    n = len(data)
    block_align = 2  # mono * 16-bit
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16,  # fmt chunk size (PCM)
            1,  # audio format: PCM
            1,  # channels
            sample_rate,
            sample_rate * block_align,  # byte rate
            block_align,
            16,  # bits per sample
        )
        + b"data"
        + struct.pack("<I", n)
    )
    return header + data


def wav_parse_header(payload: bytes) -> dict:
    """Parse a canonical WAV header with stdlib ``struct`` — the REAL
    audio codec path (magics checked, fields unpacked; raises
    ``ValueError`` on malformed input rather than faking)."""
    if len(payload) < _WAV_HEADER_LEN or payload[:4] != b"RIFF" or payload[8:16] != b"WAVEfmt ":
        raise ValueError("not a canonical RIFF/WAVE payload")
    (
        fmt_size,
        audio_format,
        n_channels,
        sample_rate,
        byte_rate,
        block_align,
        bits_per_sample,
    ) = struct.unpack("<IHHIIHH", payload[16:36])
    if fmt_size != 16 or audio_format != 1 or payload[36:40] != b"data":
        raise ValueError("unsupported WAV layout (non-PCM or extra chunks)")
    (data_len,) = struct.unpack("<I", payload[40:44])
    if byte_rate != sample_rate * block_align or data_len > len(payload) - _WAV_HEADER_LEN:
        raise ValueError("inconsistent WAV header")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits_per_sample,
        "n_samples": data_len // block_align,
        "data": payload[_WAV_HEADER_LEN : _WAV_HEADER_LEN + data_len],
    }


# ---------------------------------------------------------------------------
# PPM (netpbm P6) — real image codec; video = multi-image stream
# ---------------------------------------------------------------------------
def ppm_encode(pixels: bytes, width: int, height: int) -> bytes:
    """One REAL binary PPM (P6, maxval 255): ``P6\\n{w} {h}\\n255\\n``
    + raw RGB raster. Raises if the raster size disagrees with the
    declared dimensions (a writer must never emit a torn image)."""
    if width <= 0 or height <= 0 or len(pixels) != width * height * 3:
        raise ValueError(
            f"raster is {len(pixels)} bytes, want {width}x{height}x3"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


_WS = b" \t\r\n\x0b\x0c"


def _ppm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token per the netpbm grammar: skip whitespace and
    ``#``-to-end-of-line comments, then take the maximal run of
    non-whitespace bytes."""
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS:
            pos += 1
        elif c == 0x23:  # '#'
            while pos < n and buf[pos] != 0x0A:
                pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos] not in _WS:
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def ppm_parse(payload: bytes, offset: int = 0) -> dict:
    """Parse ONE P6 image starting at ``offset`` — the REAL netpbm
    grammar (arbitrary whitespace between header tokens, ``#``
    comments, exactly one whitespace byte between maxval and raster).
    Returns header fields, the raster, and the end offset so callers
    can walk a multi-image stream. Raises ``ValueError`` on anything
    malformed — no silent fake."""
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2
    vals = []
    for _ in range(3):
        tok, pos = _ppm_token(payload, pos)
        if not tok.isdigit():
            raise ValueError(f"non-numeric PPM header token {tok!r}")
        vals.append(int(tok))
    width, height, maxval = vals
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PPM dimensions")
    if maxval != 255:
        raise ValueError("only maxval 255 (8-bit) PPM is supported")
    if pos >= len(payload) or payload[pos] not in _WS:
        raise ValueError("missing whitespace before PPM raster")
    pos += 1  # exactly ONE whitespace byte separates maxval and raster
    n = width * height * 3
    if len(payload) < pos + n:
        raise ValueError("truncated PPM raster")
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": payload[pos : pos + n],
        "end": pos + n,
    }


def ppm_parse_all(payload: bytes) -> list[dict]:
    """Walk a multi-image PPM stream (the netpbm spec allows several
    images per file, back to back) — one dict per frame."""
    frames = []
    off = 0
    while off < len(payload):
        frame = ppm_parse(payload, off)
        frames.append(frame)
        off = frame["end"]
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


def _text_raster(data: bytes) -> tuple[bytes, int]:
    """Deterministic raster from a document's utf-8 bytes: 64-px-wide
    RGB rows, last row zero-padded; empty text becomes one zero row.
    Returns (raster, height). The height depends on the text length,
    which is what lets the DuckDB oracle predict the full container
    arithmetic per row (a constant-size raster would check nothing)."""
    height = max(1, -(-len(data) // _BYTES_PER_ROW))
    raster = data.ljust(height * _BYTES_PER_ROW, b"\x00")
    return raster, height


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture over real containers: each
    document's utf-8 bytes become the payload of a REAL format
    (media_type cycles by doc_id):

    - audio → genuine WAV (``wav_encode``)
    - image → genuine P6 PPM, 64 px wide, height = ceil(bytes/192)
    - video → ``n_frames`` P6 frames concatenated (netpbm multi-image
      stream); frame f's raster is the image raster rolled by f bytes
      (deterministic, and every frame differs)

    Byte packing has no JVM expression, so payload assembly is one
    Arrow-batched pandas pass; the typed metadata (width/height/
    n_frames/sample_rate) is plain column math. Every downstream
    entry stays oracle-able: the oracle predicts the WAV and PPM
    container arithmetic (header lengths included) from the text
    length alone."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: pd is function-local (see similarity._signatures)
    @pandas_udf("binary")
    def pack_payload(data, mt, nf):
        def one(args):
            b, t, k = args
            b = bytes(b)
            if t == "audio":
                return wav_encode(b)
            raster, h = _text_raster(b)
            if t == "image":
                return ppm_encode(raster, IMG_WIDTH, h)
            arr = np.frombuffer(raster, dtype=np.uint8)
            return b"".join(
                ppm_encode(np.roll(arr, -f).tobytes(), IMG_WIDTH, h)
                for f in range(int(k))
            )

        return pd.Series(map(one, zip(data, mt, nf)))

    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    raw = F.encode("text", "utf-8")
    nf = (
        F.when(mt == "video", (F.col("doc_id") % 7 + 2))
        .otherwise(F.lit(1))
        .cast("int")
    )
    # pixel rows: height = ceil(octet_length/192), min 1 (the writer's
    # _text_raster math, restated as column arithmetic)
    h = F.greatest(
        F.lit(1), F.floor((F.octet_length(raw) + 191) / 192)
    ).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        pack_payload(raw, mt, nf).alias("content"),
        F.when(mt != "audio", F.lit(IMG_WIDTH)).cast("int").alias("width"),
        F.when(mt != "audio", h).cast("int").alias("height"),
        nf.alias("n_frames"),
        F.when(mt == "audio", F.lit(WAV_SAMPLE_RATE)).cast("int").alias("sample_rate"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch decode — every modality through its REAL parser.
    Audio: WAV header fields + 32-bin histogram over decoded int16
    samples. Image/video: PPM header(s) + 32-bin histogram over the
    decoded RGB raster of every frame. Malformed payloads raise."""
    out = {
        "decoder": [],
        "n_bytes": [],
        "width": [],
        "height": [],
        "n_frames": [],
        "sample_rate": [],
        "n_channels": [],
        "bits_per_sample": [],
        "n_samples": [],
        "features": [],
    }
    for mt, payload in zip(pdf["media_type"], pdf["content"]):
        payload = bytes(payload)
        if mt == "audio":
            wav = wav_parse_header(payload)  # raises on malformed input
            samples = np.frombuffer(wav["data"], dtype="<i2")
            if samples.size:
                hist, _ = np.histogram(
                    samples, bins=FEATURE_DIM, range=(-32768, 32768)
                )
                feats = (hist / samples.size).astype(np.float32)
            else:
                feats = np.zeros(FEATURE_DIM, dtype=np.float32)
            out["decoder"].append("wav-pcm-v1")
            out["width"].append(None)
            out["height"].append(None)
            out["n_frames"].append(None)
            out["sample_rate"].append(wav["sample_rate"])
            out["n_channels"].append(wav["n_channels"])
            out["bits_per_sample"].append(wav["bits_per_sample"])
            out["n_samples"].append(wav["n_samples"])
            out["features"].append(feats)
        elif mt in ("image", "video"):
            frames = ppm_parse_all(payload)  # raises on malformed input
            raster = np.frombuffer(
                b"".join(f["pixels"] for f in frames), dtype=np.uint8
            )
            hist, _ = np.histogram(raster, bins=FEATURE_DIM, range=(0, 256))
            feats = (hist / raster.size).astype(np.float32)
            out["decoder"].append("ppm-p6-v1")
            out["width"].append(frames[0]["width"])
            out["height"].append(frames[0]["height"])
            out["n_frames"].append(len(frames))
            out["sample_rate"].append(None)
            out["n_channels"].append(None)
            out["bits_per_sample"].append(None)
            out["n_samples"].append(None)
            out["features"].append(feats)
        else:  # pragma: no cover - fixture has no other modality
            raise NotImplementedError(
                f"no codec wired for media_type={mt!r}; supported: "
                "WAV PCM audio, P6 PPM image, multi-image PPM video"
            )
        out["n_bytes"].append(len(payload))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "decoder": out["decoder"],
            "n_bytes": pd.array(out["n_bytes"], dtype="int64"),
            "width": pd.array(out["width"], dtype="Int32"),
            "height": pd.array(out["height"], dtype="Int32"),
            "n_frames": pd.array(out["n_frames"], dtype="Int32"),
            "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
            "n_channels": pd.array(out["n_channels"], dtype="Int32"),
            "bits_per_sample": pd.array(out["bits_per_sample"], dtype="Int32"),
            "n_samples": pd.array(out["n_samples"], dtype="Int64"),
            "features": out["features"],
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas`` —
    real WAV and PPM parsers on every row (see module docstring). The
    parsed header fields flow out as typed columns, so the DuckDB
    oracle can check the writer AND the parser end to end from the
    text-length arithmetic alone."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    from ..sources.catalog import spread

    cols = ["media_id", "media_type", "content"]
    # decode is the CPU floor of this path — never let a packed
    # upstream file serialize it onto one core (sf1 audit find).
    return spread(media.select(*cols)).mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, features array<float>) — the embedding-ingest shape
    the similarity tier consumes."""
    return decode_media(media).select("media_id", "features")


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every-k-th FRAME PAYLOAD (frame 0 always
    kept): each output row carries one standalone P6 image, sliced
    out of the multi-image stream with pure JVM column math.

    This is real frame extraction without Python touching a byte:
    the writer emits uniform frames, so frame f occupies
    ``[f*frame_len, (f+1)*frame_len)`` where ``frame_len`` is the
    header+raster size recomputed from the width/height METADATA
    columns — ``substring`` over the binary column does the slicing
    inside whole-stage codegen. The 100 TB-relevant property: frame
    selection and extraction shuffle nothing and decode nothing; the
    expensive per-pixel work downstream only ever sees the sampled
    frames (non-uniform foreign streams would fall back to
    ``ppm_parse_all`` in a mapInPandas pass)."""
    vids = media.filter(F.col("media_type") == "video")
    # header: "P6\n" + w + " " + h + "\n255\n"  →  9 + digits(w) + digits(h)
    frame_len = (
        F.lit(9)
        + F.length(F.col("width").cast("string"))
        + F.length(F.col("height").cast("string"))
        + F.col("width") * F.col("height") * 3
    )
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    return (
        vids.select(
            "media_id",
            "n_frames",
            F.explode(idx).alias("frame_index"),
            "content",
            frame_len.alias("_fl"),
        )
        .select(
            "media_id",
            "n_frames",
            "frame_index",
            F.substring(
                "content", F.col("frame_index") * F.col("_fl") + 1, F.col("_fl")
            ).alias("frame"),
        )
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
    """REAL nearest-neighbor downsample via ``mapInPandas``: parse
    each P6 frame, stride the pixel grid (``raster[::s, ::s]`` on the
    (h, w, 3) numpy view — integer-stride NN resampling), re-encode
    as a valid P6. ``s = ceil(max(w, h) / max_side)`` so the longer
    side lands ≤ ``max_side``; never upscales (s=1 passes through).
    Output dims are exact integer math — ``ceil(w/s) × ceil(h/s)`` —
    which is what keeps the operation oracle-able in SQL. Videos
    resize every frame of the stream; audio rows pass through
    untouched (resize is a pixel concept)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, payloads, labels = [], [], [], []
            for mt, payload in zip(pdf["media_type"], pdf["content"]):
                payload = bytes(payload)
                if mt == "audio":  # no pixel grid
                    out_w.append(None)
                    out_h.append(None)
                    payloads.append(payload)
                    labels.append("passthrough")
                    continue
                resized = []
                nw = nh = None
                for fr in ppm_parse_all(payload):
                    w, h = fr["width"], fr["height"]
                    s = max(1, -(-max(w, h) // max_side))
                    grid = np.frombuffer(fr["pixels"], dtype=np.uint8)
                    grid = grid.reshape(h, w, 3)[::s, ::s]
                    nh, nw = grid.shape[0], grid.shape[1]
                    resized.append(
                        ppm_encode(np.ascontiguousarray(grid).tobytes(), nw, nh)
                    )
                out_w.append(nw)
                out_h.append(nh)
                payloads.append(b"".join(resized))
                labels.append("ppm-nn-v1")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                    "resizer": labels,
                    "content": payloads,
                }
            )

    cols = ["media_id", "media_type", "content"]
    return media.select(*cols).mapInPandas(run, schema=RESIZED_SCHEMA)
