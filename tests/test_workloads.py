"""Smoke + spot checks of the driver-contract workloads at sf0.001.
Full differential verification against DuckDB runs via
tools/selfcheck.py (the local twin of the driver's CORRECTNESS gate).
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(
        df.columns
    )


def test_every_query_has_callable_and_runs(spark, sf_small):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name


def test_oracle_coverage(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # strong-checked fraction stays high (driver sees which are weak)
    assert len(oracles) >= 0.8 * len(qs)


def test_a3_approx_distinct_scale_variant(spark, sf_small):
    """SURVEY §2 A3 scale note: approx_count_distinct is the 100 TB
    form of the distinct-count operator (no exact-distinct shuffle of
    every key). Pin its error against exact on the fixture."""
    from pyspark.sql import functions as F

    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )

    orders = read_table(spark, sf_small, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"]
