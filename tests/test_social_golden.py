"""Reference Test 1/13 twins on the synthesized FIXTURES.md §1 world:
golden cardinalities + golden members after a dirty load, subset
invariants, invalid-probe misses, and the persisted-CSV round-trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flat_file_social_media_database_engine_spark.engine import Engine
from flat_file_social_media_database_engine_spark.sources.social_fixture import (
    GOLDEN_POST_IDS,
    GOLDEN_USERS,
    generate_social_csvs,
)


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("social")
    expected = generate_social_csvs(str(d), seed=42)
    eng = Engine(spark)
    eng.load_flat_files(str(d))
    return eng, expected


def test_golden_cardinalities(loaded):
    """Test 1 (buzzdb_lab1.cpp:1112-1114): exact post-load counts —
    the dirty rows drop, the whitespace-padded valid rows survive."""
    eng, expected = loaded
    assert eng.tables["users"].count() == expected["users"]
    assert eng.tables["posts"].count() == expected["posts"]
    assert eng.tables["engagements"].count() == expected["engagements"]
    # distinct usernames == users; exactly 4000 posting authors
    u = eng.tables["users"]
    assert u.select("username").distinct().count() == expected["users"]
    assert (
        eng.tables["posts"].select("username").distinct().count() == 4000
    )


def test_golden_members_exist(loaded):
    """Test 1 (:1116-1122): named users exist; golden postIds are
    referenced by engagements."""
    eng, _ = loaded
    u = eng.tables["users"]
    have = {
        r["username"]
        for r in u.filter(F.col("username").isin(*GOLDEN_USERS)).collect()
    }
    assert have == set(GOLDEN_USERS)
    referenced = {
        r["postId"]
        for r in eng.tables["engagements"]
        .filter(F.col("postId").isin(*GOLDEN_POST_IDS))
        .select("postId")
        .distinct()
        .collect()
    }
    assert referenced == set(GOLDEN_POST_IDS)
    assert eng.tables["posts"].filter("id = 19").count() == 1


def test_subset_invariants_and_probe_misses(loaded):
    """Test 1 (:1124-1138) set-intersection subsets + Test 3/5 invalid
    probes (:1220, :1340): out-of-range ids miss."""
    eng, _ = loaded
    post_users = eng.tables["posts"].select("username").distinct()
    users = eng.tables["users"].select("username").distinct()
    assert post_users.intersect(users).count() == post_users.count()
    eng_posts = eng.tables["engagements"].select("postId").distinct()
    posts = eng.tables["posts"].select(F.col("id").alias("postId")).distinct()
    assert eng_posts.intersect(posts).count() == eng_posts.count()
    assert eng.ri_report().filter("dangling_count > 0").count() == 0
    # invalid probes
    assert eng.tables["users"].filter("id = 10500").count() == 0
    assert eng.get_all_user_comments(10500).count() == 0


def test_csv_export_reload_roundtrip(loaded, spark, tmp_path):
    """Test 13 (:1677-1709): exported CSVs re-parse losslessly — the
    loader's strict rules accept every exported row and the tables
    come back identical."""
    eng, expected = loaded
    out = tmp_path / "export"
    eng.export_csv(str(out))
    eng2 = Engine(spark)
    eng2.load_flat_files(str(out))
    for name in ("users", "posts", "engagements"):
        a = sorted(map(tuple, eng.tables[name].collect()))
        b = sorted(map(tuple, eng2.tables[name].collect()))
        assert a == b, name
        assert len(a) == expected[name]
