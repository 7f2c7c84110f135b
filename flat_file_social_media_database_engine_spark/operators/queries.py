"""The reference's read queries, as declarative Spark plans.

Q1 ``getAllUserComments`` (buzzdb_lab1.cpp:682-718) and Q2
``getAllEngagementsByLocation`` (buzzdb_lab1.cpp:725-766). The
reference hand-fuses filter-before-scan and build-small-probe-large;
here both fall out of Catalyst's predicate pushdown and broadcast
hash join selection — see SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_all_user_comments(
    users: DataFrame, engagements: DataFrame, user_id: int
) -> DataFrame:
    """Q1: all (postId, comment) pairs for a user's comments, ordered.

    Reference pipeline (buzzdb_lab1.cpp:682-718): point-lookup the
    user id → username (:689-696, empty result if absent :692-693),
    scan engagements for ``username == u && type == "comment"``
    (:700-710), project (postId, comment) (:707), sort by
    (postId, comment) (:712).

    Spark plan: inner equi-join against the 1-row filtered users side
    (broadcast), conjunctive filter pushed below the join, global sort
    for the order-sensitive contract (reference Test 3 asserts order,
    buzzdb_lab1.cpp:1252-1269).
    """
    user_row = users.filter(F.col("id") == F.lit(user_id)).select("username")
    return (
        engagements.filter(F.col("type") == F.lit("comment"))
        .join(F.broadcast(user_row), on="username", how="inner")
        .select("postId", "comment")
        .orderBy("postId", "comment")
    )


def get_engagements_by_location(
    users: DataFrame, engagements: DataFrame, location: str
) -> DataFrame:
    """Q2: (likes, comments) counts over engagements by users at a
    location.

    Reference pipeline (buzzdb_lab1.cpp:725-766): build the username
    set at the location (:729-740), semi-join probe the engagement
    scan (:747-755), single-pass conditional count of likes vs
    comments (:757-761). Empty location ⇒ (0, 0) (:741-742) — Spark's
    empty-relation propagation / AQE gives the same short-circuit.

    Returns one row ``(likes, comments)``.
    """
    local_users = users.filter(F.col("location") == F.lit(location)).select("username")
    return (
        engagements.join(F.broadcast(local_users), on="username", how="left_semi")
        .agg(
            F.count(F.when(F.col("type") == "like", 1)).alias("likes"),
            F.count(F.when(F.col("type") == "comment", 1)).alias("comments"),
        )
    )
