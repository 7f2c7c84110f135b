"""Salted join: row-identical to the plain join on a hot-key dataset,
with the salt visibly part of the join key (the hot key's rows land
on SALT partitions instead of one)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flat_file_social_media_database_engine_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 10k rows, 90% on key 1 (the hot key), the rest uniform over 100
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1))
        .otherwise(F.pmod(F.col("id"), 100))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    plain = fact.join(dim, fact.k == dim.dk, "inner").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k", "dk", "inner", salt=8).select(
        "k", "payload", "attr"
    )
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }

    # the salt is genuinely in the join key
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted_join(fact, dim, "k", "dk", salt=8).explain()
    assert "__salt" in buf.getvalue()


def test_grouped_prefix_sum_splits_hot_group(spark):
    """The skew the round-6 prefix-sum rewrite exists for: ONE group
    holding ~95% of the rows. The sharded formulation must (a) match
    the monolithic window's answer exactly and (b) actually split the
    hot group across range partitions — every per-(pid, group) slice
    strictly smaller than the hot group itself."""
    from pyspark.sql import Window

    from flat_file_social_media_database_engine_spark.operators.rankselect import (
        grouped_prefix_sum,
    )

    n = 8_000
    df = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), F.pmod(F.col("id"), 5)))
        .alias("g"),
        F.col("id").alias("tid"),
        (F.col("id") % 7 + 1).cast("bigint").alias("val"),
    )
    parts = 16
    got = grouped_prefix_sum(
        df, ["g"], [F.col("tid").asc()], value_col="val", out_col="run",
        num_partitions=parts,
    )
    w = (
        Window.partitionBy("g")
        .orderBy("tid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("run", F.coalesce(F.sum("val").over(w), F.lit(0)))
    assert sorted(map(tuple, got.select("g", "tid", "val", "run").collect())) == sorted(
        map(tuple, want.collect())
    )
    # the hot group's rows span multiple range partitions (the
    # monolithic window would put all ~7600 in one task)
    slice_sizes = (
        df.repartitionByRange(parts, F.col("g").asc(), F.col("tid").asc())
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("g") == "hot")
        .groupBy("pid")
        .count()
        .collect()
    )
    hot_total = sum(r["count"] for r in slice_sizes)
    assert len(slice_sizes) > 1
    assert max(r["count"] for r in slice_sizes) < hot_total


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.range(20).select(
        (F.col("id") + 1000).alias("k"), F.col("id").alias("payload")
    )  # no dim match
    dim = spark.range(10).select(F.col("id").alias("dk"), F.lit("x").alias("attr"))
    out = salted_join(fact, dim, "k", "dk", "left", salt=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["attr"] is None for r in rows)
