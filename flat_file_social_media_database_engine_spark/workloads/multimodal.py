"""Multimodal workload entries: the binary-column pipeline from
``functions.multimodal`` instantiated on the ``documents`` fixture
(payloads are the documents' utf-8 bytes — deterministic, so both
entries are reproducible; the decode itself is the clearly-labeled
fake-histogram stub, see functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import decode_media, synthesize_media_from_documents
from ..sources.catalog import read_table
from . import query


@query(
    "mm_payload_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           count(*) AS n_media,
           CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
               AS total_bytes,
           CAST(sum(CASE WHEN doc_id % 3 = 2
                         THEN doc_id % 7 + 2 ELSE 1 END) AS BIGINT)
               AS total_frames
    FROM documents
    GROUP BY 1
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column bookkeeping (bytes/frames per modality) — pure
    JVM column math over the binary payloads; the oracle proves the
    binary synthesis (encode + metadata typing) matches on both
    engines byte-for-byte."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
    )


@query("mm_decode_features")  # rows-only: decode runs in mapInPandas
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode + feature extraction (the mapInPandas
    path). Deterministic fake decoder; rows-only driver check, with
    the feature math pinned in tests/test_multimodal.py."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return decode_media(media)


@query(
    "mm_resize_stats",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             doc_id
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(CASE WHEN media_type = 'audio' THEN n_bytes
                         ELSE (n_bytes + 1) // 2 END) AS BIGINT)
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
    payload length is ceil(n/2)); audio passes through untouched. The
    oracle replays the same metadata/stride math in SQL — proving the
    mapInPandas pass (schema, nullable Int32 metadata, binary out)
    end-to-end, not just in pytest."""
    from ..functions.multimodal import resize_media

    docs = read_table(spark, sf_dir, "documents")
    resized = resize_media(synthesize_media_from_documents(docs), max_side=32)
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes_resized"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )
