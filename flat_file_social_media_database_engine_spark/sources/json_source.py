"""JSON-lines source/sink with pinned schemas.

The reference reads/writes CSV only; a training-data pipeline's other
ubiquitous interchange format is JSONL. Same discipline as every
other source in this engine: the schema is DECLARED, never inferred
(inference costs an extra pass and silently drifts types across
drops), and malformed lines drop instead of erroring
(``mode=DROPMALFORMED`` — the JSONL twin of the CSV loader's
coerce-or-drop rules).

Timestamps round-trip as ISO-8601 UTC strings with microsecond
precision (``_TS_FMT``): Spark's JSON writer emits them, the reader
parses them back under the same format, and the session timezone is
pinned UTC on both legs, so write→read is value-identical (pytest
``test_json_source.py``). At scale a JSONL scan is split-parallel
like CSV; prefer parquet for re-reads — this is the ingest/export
edge, not the storage format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FIXTURE_SCHEMAS

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # NTZ columns (e.g. o_orderdate)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Export a table as JSON lines (one object per line, ISO-8601
    UTC timestamps, µs precision for both TZ and NTZ columns)."""
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    (
        df.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_NTZ_FMT)
        .json(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema=None,
) -> DataFrame:
    """Read JSON lines under a pinned schema — the named fixture
    table's declared one, or an explicit ``schema`` (e.g. a
    parquet-read df's schema, which may carry TIMESTAMP_NTZ where the
    declaration says TIMESTAMP). Malformed lines drop (never error),
    like every loader here."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if schema is None:
        schema = FIXTURE_SCHEMAS[table]
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_NTZ_FMT)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
