"""Zero-row differential: every query, both engines, EMPTY tables.

An empty input is not an edge case at scale — a brand-new tenant, a
fully-filtered partition, a source that produced nothing overnight.
Two distinct failure classes hide there:

1. Crashes (null min/max feeding sequence(), quantile/codebook
   training on nothing, head-of-empty) — the engine must return a
   defined result, never throw.
2. Semantics drift between engines — aggregates over empty inputs are
   where SQL dialects classically disagree (0-row group-by vs 1-row
   NULL aggregate, sum()=NULL vs 0, count()=0).

So: 0-row copies of every fixture table, exact schemas (pyarrow
schema lifted from the real sf0.001 files), then the SAME
row/schema/dtype/value-hash compare the driver uses, over the entire
registered surface.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import dtype_drift, value_hash

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in _TABLES:
        src = os.path.join(_SRC, f"{t}.parquet")
        tbl = pq.read_table(src)
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_oracle(empty_dir):
    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(empty_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _names() -> list[str]:
    return list(entrymod.queries())


@pytest.mark.parametrize("name", _names())
def test_empty_tables_match_oracle(spark, empty_dir, empty_oracle, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, empty_dir).toPandas()
    odf = empty_oracle.sql(oracles[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    if len(sdf):  # dtype inference on 0-row pandas frames is noise
        assert not (drift := dtype_drift(sdf, odf)), drift
        assert value_hash(sdf) == value_hash(odf), "value hash mismatch"
