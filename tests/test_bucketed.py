"""Bucketed co-located joins: same-key same-count bucketed tables
join with ZERO exchanges (the shuffle was paid at write time), and
the result matches the plain shuffled join."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flat_file_social_media_database_engine_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from flat_file_social_media_database_engine_spark.sources.catalog import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark):
    orders = read_table(spark, SF, "orders")
    lineitem = read_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey")
    try:
        # disable broadcast so the test proves co-location, not
        # small-table luck
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # same rows as the plain (shuffling) join over the raw scans
        want = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .select("l_orderkey", "o_totalprice", "l_quantity")
            .count()
        )
        assert joined.count() == want
        # and the un-bucketed twin DOES exchange — the delta is real
        raw_plan = _plan(
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
                "l_orderkey", "o_totalprice", "l_quantity"
            )
        )
        assert "Exchange" in raw_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucket_pruning_point_lookup(spark):
    """A point predicate on the bucket key scans one bucket, not all
    (numFiles in the scan node drops to the single matching bucket)."""
    orders = read_table(spark, SF, "orders")
    write_bucketed(orders, "b_orders_prune", "o_orderkey", n_buckets=8)
    try:
        # the planner skips bucketed scans when no operator needs the
        # distribution; force it so bucket PRUNING (1-of-8 buckets
        # scanned for a point predicate) is observable
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        bo = read_bucketed(spark, "b_orders_prune")
        row = bo.filter(F.col("o_orderkey") == 7)
        assert row.count() <= 1
        plan = row._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS b_orders_prune")


def test_ivf_cell_bucketed_layout_prunes_probes(spark):
    """The IVF docstrings' 100 TB claim, pinned: write embeddings
    bucketed by their assigned k-means cell and an nprobe-cell probe
    scans only the matching buckets — partition pruning instead of a
    shuffle — while returning exactly the unbucketed probe's rows."""
    from flat_file_social_media_database_engine_spark.workloads.similarity import (
        KMEANS_NPROBE,
        _km_assign,
        _kmeans_train,
    )

    base, cents = _kmeans_train(spark, SF)
    assigned = _km_assign(base, cents).select(
        "vec_id", F.col("cell").cast("bigint").alias("cell")
    )
    write_bucketed(assigned, "b_ivf_cells", "cell", n_buckets=8)
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        lists = read_bucketed(spark, "b_ivf_cells")
        probe_cells = list(range(KMEANS_NPROBE))
        probed = lists.filter(F.col("cell").isin(probe_cells))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan
        want = {
            r["vec_id"]
            for r in assigned.filter(F.col("cell").isin(probe_cells)).collect()
        }
        got = {r["vec_id"] for r in probed.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS b_ivf_cells")
