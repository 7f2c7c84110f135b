"""Coerce-or-drop CSV semantics (reference S1/S2/S3 —
buzzdb_lab1.cpp:126-316) exercised on a dirty synthetic fixture, the
way the reference's course CSVs exercised its loader (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from flat_file_social_media_database_engine_spark.sources.csv_source import (
    load_social_tables,
    read_csv_strict,
)
from flat_file_social_media_database_engine_spark.schemas import USERS

USERS_CSV = """id,username,location
1,alice,paris
2, bob ,  london
3,carol,nyc

x,badid,nyc
4,dave
5,eve,rome,extra
 6 ,frank,berlin
7,,oslo
"""

POSTS_CSV = """id,content,username,views
10,hello world,alice,5
11,spark ftw,bob,0
12,ghost author,nobody,3
13,zero,carol,notanint
14,ok,frank,7
"""

ENG_CSV = """id,postId,username,type,comment,timestamp
100,10,bob,like,None,1111
101,10,carol,comment,nice,1112
102,12,alice,like,None,1113
103,10,ghost,comment,who,1114
104,99,alice,like,None,1115
105,11,frank,comment,first,1116
"""


@pytest.fixture(scope="module")
def social_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("social")
    (d / "users.csv").write_text(USERS_CSV)
    (d / "posts.csv").write_text(POSTS_CSV)
    (d / "engagements.csv").write_text(ENG_CSV)
    return str(d)


def test_users_coerce_or_drop(spark, social_dir):
    users = read_csv_strict(
        spark, f"{social_dir}/users.csv", USERS, ["id"], dedupe_keys=["id"]
    )
    rows = {r["id"]: r for r in users.collect()}
    # blank line, non-numeric id, wrong arity (4,5e) dropped
    assert set(rows) == {1, 2, 3, 6, 7}
    # 6-char whitespace class trimmed both ends (buzzdb_lab1.cpp:131-141)
    assert rows[2]["username"] == "bob"
    assert rows[2]["location"] == "london"
    assert rows[6]["username"] == "frank"
    # empty string stays (only ints must parse)
    assert rows[7]["username"] == ""


def test_ri_filter_order_matters(spark, social_dir):
    t = load_social_tables(spark, social_dir)
    # post 12 dropped (author 'nobody' ∉ users); post 13 dropped
    # (views not an int) — buzzdb_lab1.cpp:251-252, :243-249
    assert {r["id"] for r in t["posts"].collect()} == {10, 11, 14}
    # engagement 102 dropped because its post (12) was dropped — RI is
    # against *surviving* posts (buzzdb_lab1.cpp:258-264); 103 dropped
    # (ghost user), 104 dropped (post 99 absent).
    assert {r["id"] for r in t["engagements"].collect()} == {100, 101, 105}


def test_duplicate_key_first_wins(spark, tmp_path):
    p = tmp_path / "users.csv"
    p.write_text("id,username,location\n1,first,aa\n2,other,bb\n1,second,cc\n")
    users = read_csv_strict(spark, str(p), USERS, ["id"], dedupe_keys=["id"])
    rows = {r["id"]: r["username"] for r in users.collect()}
    assert rows == {1: "first", 2: "other"}
