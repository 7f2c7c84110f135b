"""JSONL source/sink: pinned-schema round-trip (values + dtypes) and
drop-malformed parity with the engine's loader discipline."""

from __future__ import annotations

from flat_file_social_media_database_engine_spark.sources.catalog import read_table
from flat_file_social_media_database_engine_spark.sources.json_source import (
    read_jsonl,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_events_jsonl_roundtrip(spark, tmp_path):
    """Timestamps, doubles, and JSON-string props survive write→read
    exactly (ISO-8601 µs timestamps under pinned UTC)."""
    events = read_table(spark, SF, "events")
    path = str(tmp_path / "events_jsonl")
    write_jsonl(events, path)
    back = read_jsonl(spark, path, "events")
    assert back.schema == events.schema
    a = {tuple(r) for r in events.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orders_jsonl_roundtrip(spark, tmp_path):
    orders = read_table(spark, SF, "orders")
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, path)
    back = read_jsonl(spark, path, schema=orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orders.collect()}


def test_jsonl_drops_malformed_lines(spark, tmp_path):
    """Garbage lines drop silently (DROPMALFORMED), valid ones load —
    the JSONL twin of the CSV coerce-or-drop rules."""
    d = tmp_path / "dirty"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"r_regionkey": 1, "r_name": "EUROPE", "r_comment": "ok"}\n'
        "this is not json\n"
        '{"r_regionkey": "NaN-ish", "r_name": 3}\n'
        '{"r_regionkey": 2, "r_name": "ASIA", "r_comment": "ok"}\n'
    )
    back = read_jsonl(spark, str(d), "region")
    got = {(r["r_regionkey"], r["r_name"]) for r in back.collect()}
    assert got == {(1, "EUROPE"), (2, "ASIA")}
