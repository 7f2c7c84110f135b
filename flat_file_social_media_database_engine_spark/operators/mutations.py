"""Batch mutation dataflows (reference M1-M3, SURVEY.md §2.7).

The reference's writes are row-at-a-time OLTP under table mutexes
with whole-file CSV rewrites (buzzdb_lab1.cpp:603-963). That model
does not map to Spark; each mutation is re-expressed as a pure
dataflow producing a NEW table DataFrame, which callers persist via
the snapshot store (plans.snapshots) — copy-on-write publish replaces
tmp-file + atomic rename (buzzdb_lab1.cpp:1032-1059).

Concurrency translation (SURVEY.md §2.10): the reference's Test 7
(100 concurrent increments, buzzdb_lab1.cpp:1432-1490) becomes a
deltas *table*; associativity of sum replaces locking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.integrity import validate_batch


def apply_view_deltas(
    posts: DataFrame,
    deltas: DataFrame,
    key: str = "id",
    target: str = "views",
    delta_col: str = "delta",
) -> DataFrame:
    """M1 batched: ``target += sum(delta)`` per key, clamped at 0.

    Reference ``updatePostViews`` (buzzdb_lab1.cpp:603-631): point
    update ``views += delta`` floored at 0 (:619-622); missing ids are
    untouched (reference returns false, :612-613 — here rows simply
    pass through unchanged).

    DOCUMENTED DIVERGENCE (batch semantics): the clamp applies once to
    the NET batch sum, not per delta. With views=5 and deltas
    [-10, +3] the reference's sequential path yields 3 (clamp fires
    mid-sequence); here the net is -7 → greatest(0, -2) = 0. For
    non-negative deltas (the reference's Test 7 workload) the two are
    identical; mixed-sign batches are clamped on the net sum. Pinned
    by tests/test_engine (mixed-sign clamp test).

    Deltas are pre-aggregated (map-side combinable) then broadcast-
    joined onto the table — one shuffle-free pass over the big side
    when the delta set is small, which is the Test-7 shape (100
    updates against 5k posts; at 100 TB, a bounded update batch
    against a huge table).
    """
    agg = deltas.groupBy(key).agg(F.sum(delta_col).alias("__delta"))
    return (
        posts.join(F.broadcast(agg), on=key, how="left")
        .withColumn(
            target,
            F.when(
                F.col("__delta").isNotNull(),
                F.greatest(F.lit(0).cast(posts.schema[target].dataType),
                           F.col(target) + F.col("__delta").cast(posts.schema[target].dataType)),
            ).otherwise(F.col(target)),
        )
        .drop("__delta")
        .select(*posts.columns)
    )


def validated_append(
    table: DataFrame,
    batch: DataFrame,
    fk_checks: list[tuple[DataFrame, str, str]],
) -> DataFrame:
    """M2: FK-validate a batch then append (union) it.

    Reference ``addEngagementRecord`` (buzzdb_lab1.cpp:639-673):
    probes posts.id and users.username before accepting the row
    (:645-661), silently dropping failures; accepted rows are appended
    (:663-672). Here the probes are broadcast semi-joins over the
    whole batch and the append is a unionByName — at scale this is a
    partition-local concat, no shuffle.
    """
    ok = validate_batch(batch.select(*table.columns), fk_checks)
    return table.unionByName(ok)


def rename_user(
    users: DataFrame,
    posts: DataFrame,
    engagements: DataFrame,
    user_id: int,
    new_username: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """M3: cascading rename of a user across all three tables.

    Reference ``updateUserName`` (buzzdb_lab1.cpp:775-963): resolve
    id → old username (:783-786), rewrite users on id (:790-839),
    posts on old username (:841-883), engagements on old username
    (:885-930) — three *separately* atomic file renames. Here all
    three new DataFrames are produced from one old-username lookup
    and the caller commits them as a single multi-table snapshot
    (strictly stronger than the reference: no crash window between
    per-table renames — SURVEY.md §2.7 M3).

    Returns (users', posts', engagements').
    """
    old = users.filter(F.col("id") == F.lit(user_id)).select(
        F.col("username").alias("__old")
    )
    # Broadcast the 0-or-1-row lookup; a missing id yields an empty
    # build side → the left join matches nothing and every table
    # passes through unchanged (reference returns false, :783-785).
    old_b = F.broadcast(old)

    def subst(df: DataFrame) -> DataFrame:
        return (
            df.join(old_b, df["username"] == old_b["__old"], how="left")
            .withColumn(
                "username",
                F.when(F.col("__old").isNotNull(), F.lit(new_username)).otherwise(
                    F.col("username")
                ),
            )
            .select(*df.columns)
        )

    # users match on id, not username (buzzdb_lab1.cpp:790-839).
    users_new = users.withColumn(
        "username",
        F.when(F.col("id") == F.lit(user_id), F.lit(new_username)).otherwise(
            F.col("username")
        ),
    )
    posts_new = subst(posts)
    eng_new = subst(engagements)
    return users_new, posts_new, eng_new


def rekey_cascade(
    dim: DataFrame,
    facts: list[tuple[DataFrame, str]],
    dim_key: str,
    old_key,
    new_key,
) -> tuple[DataFrame, list[DataFrame]]:
    """Generic M3 on the fixture schema: re-key a dim row and
    propagate to fact FK columns (FIXTURES.md §2: customer re-key
    propagated to orders.o_custkey)."""
    dim_new = dim.withColumn(
        dim_key,
        F.when(F.col(dim_key) == F.lit(old_key), F.lit(new_key)).otherwise(
            F.col(dim_key)
        ),
    )
    facts_new = [
        fact.withColumn(
            fk,
            F.when(F.col(fk) == F.lit(old_key), F.lit(new_key)).otherwise(F.col(fk)),
        )
        for fact, fk in facts
    ]
    return dim_new, facts_new
