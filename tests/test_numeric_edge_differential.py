"""Adversarial-numerics differential for the aggregate family.

The fixture's monetary values are tame; production feeds are not.
This plants orders with negative totals, exact zero, a huge-finite
1e15, a >6-decimal value (exercises the DECIMAL(28,6) rounding
boundary both engines must share), a tiny negative, and an exact tie
pair (rank/ntile tie-breaks must fall back to keys identically), and
runs the orders-only aggregate/window queries against their oracles.

Deliberately absent: NaN/Infinity. Both engines REJECT non-finite
doubles at the DECIMAL cast (Spark ANSI raises, DuckDB cast errors)
— consistent cross-engine behavior, and the engine's posture is that
non-finite monetary values are an INGEST error, not something an
aggregate should silently absorb.
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import dtype_drift, value_hash

# Orders-only queries. Deliberately excluded:
# - o1_multikey_sort reads lineitem, not orders.
# - a5_approx_median: on 8 adversarial values spanning -5e3..1e15 the
#   sketch's relative error legitimately exceeds the 5% tolerance
#   (the exact even-count median interpolates BETWEEN two hugely
#   different middle values; the sketch returns a data point), so
#   Spark honestly reports within_tol=False while the oracle's
#   hardcoded TRUE verdict is a fixture-scale contract — checked at
#   the driver scales, not meaningful on a planted 8-row extreme
#   distribution. a5_median_totalprice (the exact twin) IS in.
ORDER_QUERIES = [
    "a5_median_totalprice",
    "orders_rfm_segments",
    "q_above_customer_avg",
    "a2_orders_rollup",
    "a2_orders_cube",
    "a3_approx_distinct",
    "a3_distinct_counts",
    "a2_orders_per_customer",
    "o3_window_suite",
    "e2_except_custkeys",
]

_ORDERS = [
    (1, 1, "F", -5000.25, datetime(2024, 1, 1), "1-URGENT"),
    (2, 1, "O", 0.0, datetime(2024, 1, 2), "2-HIGH"),
    (3, 1, "F", 1e15, datetime(2024, 1, 3), "3-MEDIUM"),      # huge finite
    (4, 2, "F", 123.456789, datetime(2024, 1, 4), "1-URGENT"),  # > scale 6
    (5, 2, "O", -0.000001, datetime(2024, 1, 5), "2-HIGH"),     # tiny negative
    (6, 3, "F", 99999999.99, datetime(2024, 1, 6), "3-MEDIUM"),
    (7, 3, "F", 99999999.99, datetime(2024, 1, 7), "3-MEDIUM"),  # exact tie
    (8, 4, "P", 42.0, datetime(2024, 1, 8), "4-NOT SPECIFIED"),
]


@pytest.fixture(scope="module")
def numedge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("numedge")
    spark.createDataFrame(
        _ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def numedge_oracle(numedge_dir):
    con = duckdb.connect()
    p = os.path.join(numedge_dir, "orders.parquet", "*.parquet")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORDER_QUERIES)
def test_numeric_edges_match_oracle(spark, numedge_dir, numedge_oracle, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, numedge_dir).toPandas()
    odf = numedge_oracle.sql(oracles[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    if len(sdf):
        assert not (drift := dtype_drift(sdf, odf)), drift
        assert value_hash(sdf) == value_hash(odf), "value hash mismatch"
