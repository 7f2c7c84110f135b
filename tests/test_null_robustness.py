"""Null-robustness differential: the driver fixtures contain no
NULLs, so the 101-query oracle battery never exercises null paths —
but real corpora and event feeds have them (failed extractions, null
user ids from logged-out sessions, null metric values). This suite
re-runs a representative slice of the surface on planted tables WITH
nulls, with the same row/schema/dtype/value-hash compare the driver
uses, so engine-vs-oracle null-semantics drift (null ordering in
windows, md5(NULL), tokenizing NULL text, NULL in group keys) fails a
test instead of a production run.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import dtype_drift, value_hash

# documents/events/embeddings queries that must survive nulls; chosen
# to cover the null-sensitive shapes: digest grouping, tokenize+
# shingle, per-group windows (null partition keys), value ordering
# (null sort keys), JSON extraction, date bucketing.
DOC_QUERIES = [
    "dedup_exact",
    "dedup_containment_pairs",
    "dedup_span_exact",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
]
EVENT_QUERIES = [
    "events_hourly_rollup",
    "events_sessionize",
    "events_session_stats",
    "events_value_percentiles",
    "events_dau_rolling",
    "events_json_extract",
]


@pytest.fixture(scope="module")
def nully_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls")
    docs = [
        (0, "plain text document with enough words to shingle nicely here",
         "en", "web", 60),
        (1, None, None, "web", None),          # null text / lang / n_chars
        (2, "", "en", None, 0),                # empty text, null source
        (3, "plain text document with enough words to shingle nicely here",
         "en", None, 60),                      # dup of 0, null source
        (4, "   ", "xx", "pdf", 3),            # whitespace-only
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    ev = [
        (1, datetime(2024, 5, 1, 10, 0, 0), 7, "view", 1.5, '{"k": 3}'),
        (2, datetime(2024, 5, 1, 10, 5, 0), 7, "view", None, None),   # null value/props
        (3, datetime(2024, 5, 1, 11, 0, 0), None, "click", 2.0, '{}'),  # null user
        (4, datetime(2024, 5, 2, 9, 0, 0), None, "click", None, '{"k": 1}'),
        (5, datetime(2024, 5, 2, 9, 1, 0), 8, None, 0.5, '{"k": 2}'),  # null type
        (6, datetime(2024, 5, 3, 9, 0, 0), 8, "purchase", 9.9, None),
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(nully_dir):
    con = duckdb.connect()
    for t in ("documents", "events"):
        # Spark writes each table as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nully_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES + EVENT_QUERIES)
def test_query_matches_oracle_with_nulls(spark, nully_dir, oracle_con, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, nully_dir).toPandas()
    odf = oracle_con.sql(oracles[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not (drift := dtype_drift(sdf, odf)), drift
    assert value_hash(sdf) == value_hash(odf), "value hash mismatch"


STREAM_QUERIES = [
    "events_stream_sessionize",
    "events_stream_clamp",
    "events_stream_ingest",
    "events_stream_attribution",
]


@pytest.fixture(scope="module")
def nully_stream_dir(spark, tmp_path_factory):
    """Streaming-entry fixture: null ts / null user / null value rows
    AND a multi-part-file layout — the two hazards the streaming
    replay stagers must absorb (null event time can't be watermarked
    and is excluded by both engine and oracle; a multi-file source
    must not lose rows behind the watermark to file ordering)."""
    d = tmp_path_factory.mktemp("nulls_stream")
    ev = [
        (1, datetime(2024, 5, 1, 10, 0, 0), 7, "view", 1.5, "{}"),
        (2, datetime(2024, 5, 1, 10, 5, 0), 7, "view", None, None),
        (3, datetime(2024, 5, 1, 11, 0, 0), None, "click", 2.0, "{}"),
        (4, None, 7, "click", 4.0, "{}"),            # null ts: excluded
        (5, datetime(2024, 5, 2, 9, 0, 0), None, "click", None, "{}"),
        (6, datetime(2024, 5, 2, 9, 1, 0), 8, None, -0.5, "{}"),
        (7, datetime(2024, 5, 8, 9, 0, 0), 8, "purchase", 9.9, None),
        (8, datetime(2024, 5, 9, 12, 0, 0), 7, "view", -100.0, "{}"),
        # a click->purchase pair inside the attribution hour, so the
        # interval-join entry has at least one row to hash
        (9, datetime(2024, 5, 10, 10, 0, 0), 9, "click", 1.0, "{}"),
        (10, datetime(2024, 5, 10, 10, 30, 0), 9, "purchase", 5.0, "{}"),
    ]
    (
        spark.createDataFrame(
            ev,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string",
        )
        .repartition(3)  # several part files on purpose
        .write.mode("overwrite")
        .parquet(str(d / "events.parquet"))
    )
    return str(d)


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_streaming_entries_match_oracle_with_nulls(
    spark, nully_stream_dir, name
):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, nully_stream_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{nully_stream_dir}/events.parquet/*.parquet')"
    )
    odf = con.sql(oracles[name]).df()
    con.close()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not (drift := dtype_drift(sdf, odf)), drift
    assert value_hash(sdf) == value_hash(odf), "value hash mismatch"
    assert len(sdf) > 0
