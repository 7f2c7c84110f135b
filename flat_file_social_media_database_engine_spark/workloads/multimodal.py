"""Multimodal workload entries: the binary-column pipeline from
``functions.multimodal`` instantiated on the ``documents`` fixture.

Payload derivation is deterministic over REAL containers (WAV PCM
audio; netpbm P6 PPM images; multi-image PPM streams for video — see
functions/multimodal.py), so every entry is oracle-able: the DuckDB
twin predicts the full container arithmetic — WAV 44-byte header +
even-padded int16 data, PPM header ``P6\\n{w} {h}\\n255\\n`` whose
LENGTH depends on the digit count of the text-length-derived height,
and per-frame multiplication for video — from ``octet_length(text)``
alone. That checks the Spark-side WRITERS and PARSERS end-to-end: a
wrong length field, a bad magic, a mis-parsed header, or an off-by-one
in the resize stride shows up as a driver hash mismatch, not just a
pytest failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import (
    decode_media,
    sample_frames,
    synthesize_media_from_documents,
)
from ..sources.catalog import read_table
from . import query

# Shared oracle arithmetic (ol = octet_length of the raw utf-8 text):
# audio: canonical WAV = 44-byte header + data padded to int16 pairs.
# pixel: raster is 64 px (192 bytes) wide, h = ceil(ol/192) rows
#        (min 1); header is "P6\n64 {h}\n255\n" = 11 + digits(h); a
#        video is (doc_id % 7 + 2) such frames concatenated.
_WAV_BYTES_SQL = "(ol + 44 + ol % 2)"
_H_SQL = "greatest(1, (ol + 191) // 192)"
_PPM_FRAME_BYTES_SQL = f"(11 + length(CAST({_H_SQL} AS VARCHAR)) + {_H_SQL} * 192)"
_NF_SQL = "(CASE WHEN media_type = 'video' THEN doc_id % 7 + 2 ELSE 1 END)"
_MT_SQL = """CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END"""


@query(
    "mm_payload_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MT_SQL} AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS ol
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(CASE WHEN media_type = 'audio' THEN {_WAV_BYTES_SQL}
                         ELSE {_NF_SQL} * {_PPM_FRAME_BYTES_SQL} END)
                AS BIGINT) AS total_bytes,
           CAST(sum({_NF_SQL}) AS BIGINT) AS total_frames
    FROM m
    GROUP BY 1
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column bookkeeping (bytes/frames per modality). The
    byte counting is JVM column math over the payloads; the oracle
    replays the WAV and PPM container arithmetic — header digit
    counts included — for every row, proving the binary synthesis
    (encode + container framing + metadata typing) matches on both
    engines byte-for-byte."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
    )


@query(
    "mm_decode_features",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MT_SQL} AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS ol
      FROM documents
    )
    SELECT doc_id AS media_id,
           media_type,
           CASE WHEN media_type = 'audio' THEN 'wav-pcm-v1'
                ELSE 'ppm-p6-v1' END AS decoder,
           CAST(CASE WHEN media_type = 'audio' THEN {_WAV_BYTES_SQL}
                     ELSE {_NF_SQL} * {_PPM_FRAME_BYTES_SQL} END
                AS BIGINT) AS n_bytes,
           CAST(CASE WHEN media_type <> 'audio' THEN 64 END AS INTEGER)
               AS width,
           CAST(CASE WHEN media_type <> 'audio' THEN {_H_SQL} END AS INTEGER)
               AS height,
           CAST(CASE WHEN media_type <> 'audio' THEN {_NF_SQL} END AS INTEGER)
               AS n_frames,
           CAST(CASE WHEN media_type = 'audio' THEN 16000 END AS INTEGER)
               AS sample_rate,
           CAST(CASE WHEN media_type = 'audio' THEN 1 END AS INTEGER)
               AS n_channels,
           CAST(CASE WHEN media_type = 'audio' THEN 16 END AS INTEGER)
               AS bits_per_sample,
           CAST(CASE WHEN media_type = 'audio' THEN (ol + 1) // 2 END
                AS BIGINT) AS n_samples
    FROM m
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas`` — audio through the
    REAL WAV parser, stills and every video frame through the REAL
    PPM parser (struct-unpacked / grammar-tokenized header fields).
    The oracle independently predicts every parsed field — sample
    counts, pixel dimensions, frame counts — from the text length,
    making this a full hash check of writer + parser on both engines.
    The feature vectors (PCM/pixel histograms) are float arrays and
    stay pinned in tests/test_multimodal.py instead; projecting them
    out here does not skip the decode — mapInPandas computes the full
    batch, the projection applies after."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return decode_media(media).select(
        "media_id",
        "media_type",
        "decoder",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "n_samples",
    )


@query(
    "mm_resize_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MT_SQL} AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS ol
      FROM documents
    ),
    geo AS (
      SELECT media_type, ol, {_NF_SQL} AS nf, {_H_SQL} AS h,
             (greatest(64, {_H_SQL}) + 31) // 32 AS s
      FROM m
    ),
    dims AS (
      SELECT media_type, ol, nf,
             (64 + s - 1) // s AS nw,
             (h + s - 1) // s AS nh
      FROM geo
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(CASE WHEN media_type = 'audio' THEN {_WAV_BYTES_SQL}
                         ELSE nf * (9 + length(CAST(nw AS VARCHAR))
                                      + length(CAST(nh AS VARCHAR))
                                      + nw * nh * 3) END)
                AS BIGINT) AS total_bytes_resized,
           CAST(sum(CASE WHEN media_type = 'audio' THEN NULL ELSE nw END)
                AS BIGINT) AS sum_width,
           CAST(sum(CASE WHEN media_type = 'audio' THEN NULL ELSE nh END)
                AS BIGINT) AS sum_height
    FROM dims
    GROUP BY media_type
    """,
)
def mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize, oracle-proven: every P6 frame's
    grid strides down by s = ceil(max(w,h)/32), so the resized stream
    is again valid PPM with ceil(w/s) × ceil(h/s) rasters and a
    header whose length tracks the new dimensions' digit counts; the
    oracle replays stride, output dims, and re-encoded container
    length in integer SQL. Audio passes through untouched (the full
    WAV container length). Proves the mapInPandas pass — parse,
    numpy grid stride, re-encode, nullable Int32 metadata, binary out
    — end-to-end, not just in pytest."""
    from ..functions.multimodal import resize_media

    docs = read_table(spark, sf_dir, "documents")
    resized = resize_media(synthesize_media_from_documents(docs), max_side=32)
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes_resized"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )


@query(
    "mm_frame_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MT_SQL} AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS ol
      FROM documents
    ),
    v AS (
      SELECT doc_id, doc_id % 7 + 2 AS nf, {_H_SQL} AS h
      FROM m WHERE media_type = 'video'
    ),
    f AS (
      SELECT doc_id, h, unnest(range(0, nf, 2)) AS frame_index FROM v
    )
    SELECT doc_id AS media_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(11 + length(CAST(h AS VARCHAR)) + h * 192 AS BIGINT)
               AS frame_bytes,
           TRUE AS is_p6
    FROM f
    """,
)
def mm_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver check for the JVM-side frame slicer: every-2nd frame of
    every video, with the sliced frame's byte length and magic. The
    whole Spark path — `sequence`/`explode` frame selection plus
    `substring` at metadata-derived byte offsets — runs in
    whole-stage codegen (no Python, no decode); the oracle predicts
    each slice's exact container length (header digit count included)
    and the kept frame indices from the text length alone. An
    off-by-one in the offset math, the stride, or the header-length
    formula produces a wrong length or a non-'P6' magic and fails the
    hash row. Exact raster equality per frame is pinned in
    tests/test_multimodal.py (slices re-parsed and diffed against the
    decoded stream)."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    frames = sample_frames(media, every_k=2)
    return frames.select(
        "media_id",
        "frame_index",
        F.length("frame").cast("bigint").alias("frame_bytes"),
        (F.substring("frame", 1, 2).cast("string") == "P6").alias("is_p6"),
    )
