"""Referential-integrity dataflows (reference S3 / J5 / J6).

The reference enforces logical FKs by load-time filtering
(buzzdb_lab1.cpp:251-252, :299-302), insert-time probes (:645-661),
and a post-hoc anti-join sweep (``check_no_dangling_post_ids``,
:1063-1070). All three are semi/anti equi-joins; at scale the dim-side
distinct key set is broadcast, exactly like the reference's in-memory
``unordered_set`` build/probe (:524-547) but shipped to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keys(dim: DataFrame, dim_key: str, fact_key: str, hint: str) -> DataFrame:
    """Distinct key projection of the build side, optionally with an
    explicit broadcast hint.

    ``hint='broadcast'`` is for true dimension edges (users, customer)
    whose distinct key set stays small at any scale — the reference's
    in-memory ``unordered_set`` build (buzzdb_lab1.cpp:524-547).
    ``hint='auto'`` is for fact-fact edges (orders→lineitem): a fact
    key set grows with the data (billions of keys at 100 TB), so the
    choice is left to AQE / autoBroadcastJoinThreshold, which picks a
    shuffled hash join once the build side stops fitting.
    """
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if hint == "broadcast":
        return F.broadcast(keys)
    return keys


def semi_filter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hint: str = "auto",
) -> DataFrame:
    """Keep fact rows whose key exists in dim (left-semi join).

    Mirrors buzzdb_lab1.cpp:207-213 (build) + :251-252 (probe). The
    build side is the *distinct key projection*, never the full dim.
    """
    return fact.join(
        _keys(dim, dim_key, fact_key, hint), on=fact_key, how="left_semi"
    )


def anti_filter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hint: str = "auto",
) -> DataFrame:
    """Fact rows whose key is missing from dim (dangling FKs)."""
    return fact.join(
        _keys(dim, dim_key, fact_key, hint), on=fact_key, how="left_anti"
    )


def dangling_keys(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Distinct dangling key values (empty ⇔ RI holds).

    Spark-native form of check_no_dangling_post_ids
    (buzzdb_lab1.cpp:1063-1070).
    """
    return anti_filter(fact, dim, fact_key, dim_key).select(fact_key).distinct()


def ri_sweep(pairs: list[tuple[DataFrame, DataFrame, str, str, str]]) -> DataFrame:
    """One-row report of dangling-FK counts for several relationships.

    ``pairs`` items: (fact, dim, fact_key, dim_key, label).
    """
    import functools

    counts = [
        anti_filter(fact, dim, fk, dk)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(label).alias("relationship"), F.col("n").alias("dangling_count"))
        for fact, dim, fk, dk, label in pairs
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), counts)


def validate_batch(
    batch: DataFrame, checks: list[tuple[DataFrame, str, str]]
) -> DataFrame:
    """FK-validate an incoming batch before append (reference J6/M2,
    buzzdb_lab1.cpp:645-661): rows failing any FK probe are dropped
    (the reference silently no-ops; callers wanting observability can
    diff the input against the result)."""
    out = batch
    for dim, batch_key, dim_key in checks:
        out = semi_filter(out, dim, batch_key, dim_key)
    return out
