"""Extreme-timestamp differential for the event-time operators.

The fixture's events live in one tidy month of 2024; event-time code
paths that a 100 TB feed WILL see are unexercised there: pre-1970
timestamps (negative epoch — sign-sensitive division/truncation bugs
live here), the epoch itself, far-future values, and exact
same-microsecond ties (ordering must fall back to the event_id
tie-break identically in both engines). This plants all of those and
runs the events-only window/sessionize/rollup queries against their
DuckDB oracles with the driver's hash compare.

The gap-fill query is exercised separately on a narrower range (its
dense spine over a 1969→2260 corpus would be ~100k rows of spine —
legal, but the interesting cases are the negative-epoch day
boundaries, not spine volume).
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import dtype_drift, value_hash

EVENT_QUERIES = [
    "events_sessionize",
    "events_sessionize_twophase",
    "events_hourly_rollup",
    "events_sliding_rollup",
    "events_funnel",
    "events_retention",
    "events_pivot_daily",
    "events_next_transition",
    "events_top_paths",
    "events_value_percentiles",
    "events_dedup_redelivery",
    "events_interarrival_stats",
]

_E = [
    # user 1: pre-1970 NEGATIVE-epoch activity (sign-sensitive
    # truncation: -90 minutes must bucket to the PREVIOUS hour/day)
    (101, datetime(1969, 12, 31, 22, 30, 0), 1, "view", 1.0),
    (102, datetime(1969, 12, 31, 23, 59, 59, 999999), 1, "click", 2.0),
    # ...crossing the epoch inside ONE session (gap < 30 min)
    (103, datetime(1970, 1, 1, 0, 10, 0), 1, "purchase", 3.0),
    # user 2: the exact epoch, then a tie pair at the SAME microsecond
    # (ordering must fall back to event_id in both engines)
    (201, datetime(1970, 1, 1, 0, 0, 0), 2, "signup", 0.0),
    (202, datetime(1970, 1, 1, 5, 0, 0, 123456), 2, "view", 1.5),
    (203, datetime(1970, 1, 1, 5, 0, 0, 123456), 2, "click", 2.5),
    # user 3: far future (wide positive epoch, micros near the top of
    # the second), two sessions
    (301, datetime(2260, 6, 1, 12, 0, 0, 999999), 3, "view", 1.0),
    (302, datetime(2260, 6, 1, 12, 20, 0), 3, "click", 1.0),
    (303, datetime(2260, 6, 2, 9, 0, 0), 3, "purchase", 9.0),
    # user 4: single event exactly on a day boundary
    (401, datetime(2000, 2, 29, 0, 0, 0), 4, "error", -1.0),  # leap day
]


@pytest.fixture(scope="module")
def timeedge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("timeedge")
    rows = [(i, ts, u, t, v, '{"k": 1}') for i, ts, u, t, v in _E]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def timeedge_oracle(timeedge_dir):
    con = duckdb.connect()
    p = os.path.join(timeedge_dir, "events.parquet", "*.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_extreme_timestamps_match_oracle(spark, timeedge_dir, timeedge_oracle, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, timeedge_dir).toPandas()
    odf = timeedge_oracle.sql(oracles[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not (drift := dtype_drift(sdf, odf)), drift
    assert value_hash(sdf) == value_hash(odf), "value hash mismatch"


def test_negative_epoch_session_crosses_epoch_boundary(spark, timeedge_dir):
    """Planted-fact sanity (not just engine agreement): user 1's
    22:30 event sits 90 min before the next (> the 30-min gap), so it
    is its own session; the 23:59:59.999999 -> 00:10:00 pair crosses
    the epoch with a 10-min gap and must be ONE session that starts
    before 1970 — a signed-gap bug (negative epoch_us subtraction)
    would split it at the boundary."""
    qs = entrymod.queries()
    rows = {
        r["session_id"]: (r["n_events"], r["session_start"], r["session_end"])
        for r in qs["events_sessionize"](spark, timeedge_dir).collect()
        if r["user_id"] == 1
    }
    assert len(rows) == 2
    n1, start1, end1 = rows[1]
    n2, start2, end2 = rows[2]
    assert (n1, n2) == (1, 2)
    # the epoch-crossing session: starts 1969-12-31, ends 1970-01-01
    assert start2 == datetime(1969, 12, 31, 23, 59, 59, 999999)
    assert end2 == datetime(1970, 1, 1, 0, 10, 0)
