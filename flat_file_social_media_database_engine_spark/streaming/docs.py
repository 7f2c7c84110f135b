"""Document-ingest staging for the streaming dedup entry.

The reference's ingest is a synchronous single-row append
(``addEngagement``, buzzdb_lab1.cpp:663-672); a training-data pipeline
ingests DOCUMENT BATCHES and needs each batch classified against the
committed corpus before it is admitted. This module stages the fixture
documents table as a deterministic batch-file replay for that stream:
the NEW docs (``doc_id >= N_OLD``) split into ``n_batches`` contiguous
doc_id ranges, one parquet file per batch, strictly increasing mtimes
so the file source replays them oldest-first under
``maxFilesPerTrigger=1``.

Same staging discipline as ``events.stage_events_daily``: content-keyed
directory (re-staged whenever any source part file changes), atomic
rename publication, one driver-side pandas pass over a bounded fixture
(a REPLAY harness, not a query path)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .events import _source_tag


def stage_documents_batches(
    spark: SparkSession, sf_dir: str, n_batches: int = 4
) -> tuple[str, int]:
    """Stage new docs as ``n_batches`` doc_id-range parquet files and
    return (directory, number of staged files). Zero new docs stages
    an empty directory (the stream drains no batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.catalog import read_table
    from ..workloads.dedup import N_OLD

    src = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    tag = _source_tag(f"docbatch{n_batches}", src)
    stage = os.path.join(tempfile.gettempdir(), f"docs_ingest_{tag}")
    if os.path.isdir(stage):
        return stage, len(
            [f for f in os.listdir(stage) if f.endswith(".parquet")]
        )
    tmp = f"{stage}.tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pdf = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= N_OLD)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    n = len(pdf)
    t0 = 1_700_000_000
    written = 0
    for i in range(n_batches):
        lo = (n * i) // n_batches
        hi = (n * (i + 1)) // n_batches
        if hi <= lo:
            continue
        path = os.path.join(tmp, f"{i:03d}_batch.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[lo:hi], schema=schema, preserve_index=False
            ),
            path,
        )
        os.utime(path, (t0 + i, t0 + i))
        written += 1
    try:
        os.rename(tmp, stage)
    except OSError:  # lost the publish race — the winner's is complete
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return stage, written
