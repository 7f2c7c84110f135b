"""Parquet fixture catalog.

Loads the driver-provided tables and registers them as temp views so
every operator is also runnable as plain Spark SQL — the engine's
"commit" is view registration, mirroring the reference's
build-then-swap load protocol (buzzdb_lab1.cpp:308-315) with
immutable DataFrames instead of a mutex'd pointer swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..schemas import FIXTURE_TABLES, EVENTS


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a NARROW scan up to cluster parallelism
    — adaptive guard for CPU-heavy map stages downstream of a packed
    upstream file.

    Parquet scan parallelism bottoms out at row-group granularity:
    a writer that packs a table into one row group (DuckDB's default
    for <=122k rows — true of the documents/embeddings fixtures at
    every scale tier) yields a scan whose every row lands in ONE task
    no matter how many byte-range splits Spark plans. Any CPU-bound
    narrow chain hanging off that scan (Arrow decode, tokenize +
    explode, broadcast-join scoring) then runs single-core until its
    first shuffle — the sf1 scaling audit measured 4-7x wall on 10x
    data for exactly this reason. The guard is a no-op whenever the
    scan is already split at least cluster-wide (the 100 TB case), so
    well-laid-out inputs pay nothing."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scans are column-pruned and
    predicate-pushed by Catalyst — the 100 TB path needs no code here
    beyond not getting in the optimizer's way.

    events.ts is TIMESTAMP(NANOS) in the file; Spark has no nanosecond
    timestamp, so it is read as long (nanosAsLong, see session.py) and
    truncated to microseconds — the same conversion DuckDB applies, so
    the oracle agrees at microsecond precision."""
    # Runtime-settable; must hold in the *caller's* session too (the
    # driver builds its own plain SparkSession, possibly under a
    # non-UTC system timezone — naive-timestamp oracles assume UTC).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = df.select([f.name for f in EVENTS.fields])
    if name in ("documents", "embeddings"):
        # The payload tables feed CPU-heavy narrow chains (tokenize,
        # hash, Arrow matmul/decode, scoring folds) in nearly every
        # consumer; spread them HERE so no per-query plan forgets.
        # Filters/pruning still reach the scan — Catalyst pushes both
        # through Repartition (pinned in tests/test_plan_hygiene.py).
        df = spread(df)
    return df


def load_fixture_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register `name` temp views."""
    dfs: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_table(spark, sf_dir, name)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs
