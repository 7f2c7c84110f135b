"""Property-based differential test of the CSV loader: the Spark
coerce-or-drop pipeline must agree row-for-row with a pure-Python
model of the reference's acceptance rules (buzzdb_lab1.cpp:126-316):
header skip, blank-line skip, naive comma split, exact arity, 6-char
trim class, full-string int parse, first-wins duplicate keys.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flat_file_social_media_database_engine_spark.schemas import USERS
from flat_file_social_media_database_engine_spark.sources.csv_source import (
    read_csv_strict,
)

_WS = "\t\n\x0b\f\r "
_INT_RE = re.compile(r"^[+-]?[0-9]+$")


def model_load(csv_text: str) -> list[tuple[int, str, str]]:
    """Reference loader model for the users table (3 cols, int id)."""
    out: dict[int, tuple[int, str, str]] = {}
    lines = csv_text.split("\n")
    for line in lines[1:]:  # header skipped
        if line == "":
            continue
        fields = line.split(",")
        if len(fields) != 3:
            continue
        fields = [f.strip(_WS) for f in fields]
        if not _INT_RE.match(fields[0]):
            continue
        v = int(fields[0])
        if not (-(2**31) <= v < 2**31):  # stoi out-of-range → drop
            continue
        if v not in out:  # first occurrence wins
            out[v] = (v, fields[1], fields[2])
    return sorted(out.values())


# Field alphabet stresses every rule: whitespace-class chars (trim),
# digits/signs (int parse), '.'/'e' (the try_cast loopholes), commas
# appear via the arity strategy below, never inside fields (the
# format has no quoting — a comma IS a field separator).
_field = st.text(alphabet="abz059 \t+-.exX", min_size=0, max_size=8)
_row = st.lists(_field, min_size=1, max_size=5).map(",".join)


@given(rows=st.lists(_row, min_size=0, max_size=30))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_loader_matches_reference_model(spark, tmp_path_factory, rows):
    csv_text = "id,username,location\n" + "\n".join(rows)
    d = tmp_path_factory.mktemp("prop")
    p = d / "users.csv"
    p.write_text(csv_text if csv_text.endswith("\n") else csv_text + "\n")

    got = sorted(
        (r["id"], r["username"], r["location"])
        for r in read_csv_strict(
            spark, str(p), USERS, ["id"], dedupe_keys=["id"]
        ).collect()
    )
    want = model_load(csv_text)
    assert got == want, f"\ncsv={csv_text!r}\ngot={got}\nwant={want}"


def test_known_tricky_rows(spark, tmp_path):
    """Deterministic pins for the classic divergences."""
    csv_text = (
        "id,username,location\n"
        "1,alice,paris\n"
        "5.7,float,nope\n"      # decimal: reference drops, try_cast wouldn't
        "1e3,sci,nope\n"        # scientific: reference drops
        "+7,signed,ok\n"        # explicit plus: stoi accepts
        "-8,negative,ok\n"
        " \t9\x0b ,trimmed,ok\n"  # 6-char class trim then parse
        "99999999999,overflow,nope\n"
        "2,bob\n"               # arity 2: drop
        "3,carol,lyon,extra\n"  # arity 4: drop
        "1,dup,ignored\n"       # duplicate id: first wins
        "\n"
        "abc,bad,id\n"
    )
    p = tmp_path / "users.csv"
    p.write_text(csv_text)
    got = sorted(
        (r["id"], r["username"], r["location"])
        for r in read_csv_strict(
            spark, str(p), USERS, ["id"], dedupe_keys=["id"]
        ).collect()
    )
    assert got == [
        (-8, "negative", "ok"),
        (1, "alice", "paris"),
        (7, "signed", "ok"),
        (9, "trimmed", "ok"),
    ]
    assert got == model_load(csv_text)


def test_first_wins_across_multiple_file_splits(spark, tmp_path):
    """Round-2 verdict item #8: first-occurrence-in-file-order dedup
    relies on monotonically_increasing_id partition indices tracking
    split order WITHIN one file. Pin it at multi-split scale: a CSV
    big enough for many splits (maxPartitionBytes forced down), every
    id duplicated with its second occurrence ~half a file away, so
    duplicate pairs straddle split boundaries throughout."""
    n = 4000
    pad = "x" * 200  # fatten rows so the file spans many splits
    lines = ["id,username,about"]
    lines += [f"{k},first_{k},{pad}" for k in range(n)]
    lines += [f"{k},second_{k},{pad}" for k in range(n)]
    p = tmp_path / "users.csv"
    p.write_text("\n".join(lines) + "\n")

    conf = spark.conf
    old = conf.get("spark.sql.files.maxPartitionBytes")
    conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        df = read_csv_strict(spark, str(p), USERS, ["id"], dedupe_keys=["id"])
        # the premise: the forced split size actually produced many
        # splits of the ONE file (otherwise this test pins nothing)
        n_splits = (
            spark.read.schema("id string, username string, about string")
            .option("header", True)
            .csv(str(p))
            .rdd.getNumPartitions()
        )
        assert n_splits >= 4, f"file read as {n_splits} split(s)"
        got = {r["id"]: r["username"] for r in df.collect()}
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(got) == n
    assert all(got[k] == f"first_{k}" for k in range(n))
