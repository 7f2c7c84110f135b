"""operators/topk.py: the map-side top-k combiner must be invisible —
same rows and ranks as the plain window — while actually pruning."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flat_file_social_media_database_engine_spark.operators.topk import (
    prune_topk_batches,
    topk_per_key,
)
from flat_file_social_media_database_engine_spark.sources.catalog import read_table

SF = "/root/testdata/sf0.001"


def _plain_window_topk(df, keys, order, k):
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


def test_topk_matches_plain_window_across_small_batches(spark):
    """Force many Arrow batches so the prune really runs per-batch,
    then assert row-and-rank equality with the unpruned window."""
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        got = topk_per_key(
            orders,
            ["o_custkey"],
            [
                (F.col("o_totalprice"), "o_totalprice", False),
                (F.col("o_orderkey"), "o_orderkey", True),
            ],
            3,
        )
        want = _plain_window_topk(
            orders,
            ["o_custkey"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
            3,
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_prune_is_superset_and_actually_prunes(spark):
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    pruned = prune_topk_batches(
        orders, ["o_custkey"], [("o_totalprice", False), ("o_orderkey", True)], 1
    )
    n_in, n_pruned = orders.count(), pruned.count()
    assert n_pruned <= n_in
    final = _plain_window_topk(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        1,
    ).drop("rnk")
    kept = {tuple(r) for r in pruned.collect()}
    assert all(tuple(r) in kept for r in final.collect())


def test_topk_forwards_null_order_values_conservatively(spark):
    """Rows with NULL in an ordering column must never be lost by the
    prune: the combined result still equals the plain window (Spark
    places nulls last under desc; the prune forwards them as-is)."""
    rows = [
        (1, "k1", 10.0),
        (2, "k1", None),
        (3, "k1", 30.0),
        (4, "k1", None),
        (5, "k2", None),
        (6, "k2", None),
    ]
    df = spark.createDataFrame(rows, "id long, key string, score double")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        got = topk_per_key(
            df,
            ["key"],
            [(F.col("score"), "score", False), (F.col("id"), "id", True)],
            3,
        )
        want = _plain_window_topk(
            df, ["key"], [F.col("score").desc(), F.col("id").asc()], 3
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_topk_rejects_nonpositive_k(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError):
        prune_topk_batches(df, ["key"], [("id", True)], 0)
