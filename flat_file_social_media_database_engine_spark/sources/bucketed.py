"""Bucketed tables: the co-located-join path.

A shuffle is the single most expensive thing a 100 TB join does. If
both sides are written bucketed (and sorted) on the join key with the
same bucket count, Spark's scan already satisfies the join's
distribution requirement and the SortMergeJoin runs with ZERO
exchanges — the shuffle was paid once at write time and amortizes
over every subsequent join. This module is the write-side helper;
``tests/test_bucketed.py`` pins the no-Exchange plan property.

At the 100 TB tier: bucket the big fact tables (lineitem on
l_orderkey, events on user_id) at a bucket count sized so one bucket
≈ one task's worth of data; dims keep broadcasting. Bucket pruning
(Spark's ``spark.sql.sources.bucketing.enabled``) also turns point
lookups on the bucket key into single-bucket scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (parquet,
    in-session catalog). One shuffle now, none at every later join."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
