"""Deterministic social-media fixture generator (FIXTURES.md §1).

The reference's course-provided CSVs are not shipped; this synthesizes
equivalent tables to the distilled spec so the reference's Test 1
golden-cardinality/member checks (buzzdb_lab1.cpp:1089-1141) have a
reproducible target:

- 10,000 users, all usernames distinct, incl. the golden members
  ``knorman``/``wchaney``/``richardbishop`` (:1116-1118); shared
  low-cardinality locations (Test 4 needs multi-user locations).
- 5,000 posts by exactly 4,000 distinct authors (:1113); ids include
  19 (Tests 6/7/10 mutate it) and 6936 (so the golden referenced
  postIds 1496/6936/4826 of :1120-1122 all exist).
- 10,000 engagements, every FK valid (RI filters drop nothing —
  post-filter cardinality equals the generated count, :1114), type in
  {like, comment}, ``comment`` text only for comments ("None" for
  likes, :1311-1312).
- Dirty rows interleaved (blank lines, wrong arity, non-numeric ids)
  plus whitespace-padded VALID rows — the coerce-or-drop loader must
  drop exactly the former and keep the latter.

All ids ≤ 100,000 and user ids ≤ 10,000 so the reference's
invalid-probe ranges (:1220, :1340, :1500) stay misses.
"""

from __future__ import annotations

import random

GOLDEN_USERS = ("knorman", "wchaney", "richardbishop")
GOLDEN_POST_IDS = (1496, 6936, 4826)
LOCATIONS = [f"city_{i:02d}" for i in range(25)]

N_USERS = 10_000
N_POSTS = 5_000
N_AUTHORS = 4_000
N_ENGAGEMENTS = 10_000


def generate_social_csvs(out_dir: str, seed: int = 42) -> dict[str, int]:
    """Write users/posts/engagements CSVs; returns expected CLEAN row
    counts per table (what the loader must yield after drops)."""
    import os

    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    usernames = [f"user{i:05d}" for i in range(1, N_USERS + 1)]
    for i, g in enumerate(GOLDEN_USERS):
        usernames[i] = g

    def dirt(kind: int, arity: int) -> str:
        if kind == 0:
            return ""  # blank line
        if kind == 1:
            return ",".join(["x"] * (arity + 1))  # over-arity
        if kind == 2:
            return ",".join(["x"] * (arity - 1))  # under-arity
        return ",".join(["notanint"] + ["pad"] * (arity - 1))  # bad key

    def pad(field: str) -> str:
        return f" \t{field}\x0b "

    users_rows = []
    for i, name in enumerate(usernames, start=1):
        loc = LOCATIONS[rng.randrange(len(LOCATIONS))]
        row = f"{i},{name},{loc}"
        if rng.random() < 0.02:  # whitespace-padded valid row
            row = ",".join(pad(f) for f in row.split(","))
        users_rows.append(row)
        if rng.random() < 0.01:
            users_rows.append(dirt(rng.randrange(4), 3))

    post_ids = [pid for pid in range(1, N_POSTS) if pid != GOLDEN_POST_IDS[1]]
    post_ids.append(GOLDEN_POST_IDS[1])  # 6936 (outside 1..4999)
    post_ids.sort()
    assert len(post_ids) == N_POSTS and 19 in post_ids
    authors = usernames[:N_AUTHORS]
    posts_rows = []
    for pid in post_ids:
        author = authors[rng.randrange(N_AUTHORS)] if pid > N_AUTHORS else authors[pid - 1]
        views = rng.randrange(0, 99)  # 1-2 digits: digit growth exercised
        posts_rows.append(f"{pid},content about topic {pid},{author},{views}")
        if rng.random() < 0.01:
            posts_rows.append(dirt(rng.randrange(4), 4))

    words = ["nice", "great", "agreed", "indeed", "wow", "hmm", "interesting"]
    eng_rows = []
    for eid in range(1, N_ENGAGEMENTS + 1):
        if eid <= len(GOLDEN_POST_IDS):
            pid = GOLDEN_POST_IDS[eid - 1]  # golden postIds referenced
        else:
            pid = post_ids[rng.randrange(N_POSTS)]
        uname = usernames[rng.randrange(N_USERS)]
        if rng.random() < 0.5:
            typ, comment = "like", "None"
        else:
            typ, comment = "comment", words[rng.randrange(len(words))]
        ts = 1_600_000_000 + rng.randrange(10_000_000)
        eng_rows.append(f"{eid},{pid},{uname},{typ},{comment},{ts}")
        if rng.random() < 0.01:
            eng_rows.append(dirt(rng.randrange(4), 6))

    import os

    for name, header, rows in [
        ("users", "id,username,location", users_rows),
        ("posts", "id,content,username,views", posts_rows),
        ("engagements", "id,postId,username,type,comment,timestamp", eng_rows),
    ]:
        with open(os.path.join(out_dir, f"{name}.csv"), "w") as f:
            f.write(header + "\n")
            f.write("\n".join(rows) + "\n")

    return {"users": N_USERS, "posts": N_POSTS, "engagements": N_ENGAGEMENTS}
