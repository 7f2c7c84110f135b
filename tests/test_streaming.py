"""Streaming-vs-batch equivalence on sf0.001: the Structured
Streaming twins must produce the same results as the batch operators
they mirror (complete-mode memory sink, AvailableNow trigger).
"""

from __future__ import annotations

import pytest

from flat_file_social_media_database_engine_spark.streaming import events as SE
from flat_file_social_media_database_engine_spark.workloads import eventflow as BE

SF = "/root/testdata/sf0.001"


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_matches_batch_rollup(spark, tmp_path):
    stream = SE.read_events_stream(spark, SF, max_files_per_trigger=1)
    got = _run_stream(spark, SE.tumbling_counts(stream), "t_tumbling")
    want = BE.events_hourly_rollup(spark, SF)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    assert len(g) > 0


def test_sessionize_matches_batch_sessions(spark):
    stream = SE.read_events_stream(spark, SF)
    got = _run_stream(spark, SE.sessionize(stream), "t_sessions")
    want = BE.events_sessionize(spark, SF).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    assert len(g) > 0


def test_json_extract_rollup_totals_match_batch(spark):
    """The streaming form windows by hour; summed across windows it
    must reproduce the batch global rollup."""
    from pyspark.sql import functions as F

    stream = SE.read_events_stream(spark, SF)
    got = (
        _run_stream(spark, SE.json_extract_rollup(stream), "t_json")
        .groupBy("event_type")
        .agg(F.sum("sum_k").alias("sum_k"), F.sum("n").alias("n"))
    )
    want = BE.events_json_extract(spark, SF)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
