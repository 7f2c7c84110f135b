"""Multimodal workload entries: the binary-column pipeline from
``functions.multimodal`` instantiated on the ``documents`` fixture.

Payload derivation is deterministic (documents' utf-8 bytes; audio
wrapped as REAL WAV files), so every entry is oracle-able: the DuckDB
twin predicts the WAV container arithmetic (44-byte header +
even-padded 16-bit data) from the text length alone, which checks the
Spark-side WAV WRITER and header PARSER end-to-end — a wrong length
field, a bad magic, or a mis-unpacked rate shows up as a driver hash
mismatch, not just a pytest failure. Pixel decode remains the
clearly-labeled fake (see functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import decode_media, synthesize_media_from_documents
from ..sources.catalog import read_table
from . import query

# Audio payloads are canonical WAV: 44-byte header + data padded to
# whole int16 samples. ol = octet_length of the raw utf-8 text.
_WAV_BYTES_SQL = "(ol + 44 + ol % 2)"
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
           CAST(sum(CASE WHEN media_type = 'audio'
                         THEN {_WAV_BYTES_SQL} ELSE ol END) AS BIGINT)
               AS total_bytes,
           CAST(sum(CASE WHEN media_type = 'video'
                         THEN doc_id % 7 + 2 ELSE 1 END) AS BIGINT)
               AS total_frames
    FROM m
    GROUP BY 1
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column bookkeeping (bytes/frames per modality). The
    byte counting is JVM column math over the payloads; the oracle
    replays the WAV container arithmetic for the audio rows, proving
    the binary synthesis (encode + WAV framing + metadata typing)
    matches on both engines byte-for-byte."""
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
                ELSE 'fake-histogram-v1' END AS decoder,
           CAST(CASE WHEN media_type = 'audio'
                     THEN {_WAV_BYTES_SQL} ELSE ol END AS BIGINT) AS n_bytes,
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
    """Arrow-batched decode via ``mapInPandas`` — the audio rows go
    through the REAL WAV parser (struct-unpacked header fields), and
    the oracle independently predicts every parsed field from the
    text length, upgrading this entry from rows-only to a full hash
    check (round-2 verdict item #7). The feature vectors (PCM/byte
    histograms) are float arrays and stay pinned in
    tests/test_multimodal.py instead; projecting them out here does
    not skip the decode — mapInPandas computes the full batch, the
    projection applies after."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return decode_media(media).select(
        "media_id",
        "media_type",
        "decoder",
        "n_bytes",
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
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(CASE WHEN media_type = 'audio' THEN {_WAV_BYTES_SQL}
                         ELSE (ol + 1) // 2 END) AS BIGINT)
               AS total_bytes_resized,
           CAST(sum(CASE WHEN media_type = 'audio' THEN NULL ELSE 32 END)
                AS BIGINT) AS sum_width,
           CAST(sum(CASE WHEN media_type = 'audio' THEN NULL ELSE 32 END)
                AS BIGINT) AS sum_height
    FROM m
    GROUP BY media_type
    """,
)
def mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, oracle-proven: the fixture's 64x64 stills and
    frames shrink to 32x32 (scale 0.5 -> byte stride 2, so resized
    payload length is ceil(n/2)); audio passes through untouched —
    which now means the full WAV container length. The oracle replays
    the same metadata/stride math in SQL — proving the mapInPandas
    pass (schema, nullable Int32 metadata, binary out) end-to-end,
    not just in pytest."""
    from ..functions.multimodal import resize_media

    docs = read_table(spark, sf_dir, "documents")
    resized = resize_media(synthesize_media_from_documents(docs), max_side=32)
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes_resized"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )
