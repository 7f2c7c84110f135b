"""Round-10 verdict item 4: wall-verify the packed-scan relayout ABOVE
the sf0.1 overhead floor.

The sf1/sf10 synthesized tiers are Spark-written multi-file parquet,
so the relayout no-ops there and the round-9 plan-level claim (1 task
-> N splits) had no wall receipt above the floor. This tool builds a
PACKED sf1 — lineitem and orders rewritten as ONE parquet file with
ONE row group, exactly the driver-fixture layout that motivated the
relayout; the other tables symlink — and measures the three biggest
relayout consumers warm (min-of-3, noop sink) under a matrix of
{relayout on, relayout off} x {8, 32 cores}. "relayout off" stubs
catalog._relayout to the identity (measurement harness only; the
shipped path is never patched outside this tool).

Usage: python tools/relayout_receipt.py build        # make packed sf1
       python tools/relayout_receipt.py run [on|off] # one measuring
           process (honors SPARK_GRAFT_CPUS); prints one line/query
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
PACKED = "/tmp/spark_graft_sf1_packed"
QUERIES = ["q_pricing_summary", "j2_chained_ri_lineitem", "orders_market_basket"]


def build() -> None:
    import pyarrow.parquet as pq

    os.makedirs(PACKED, exist_ok=True)
    for name in os.listdir(SRC):
        dst = os.path.join(PACKED, name)
        if os.path.exists(dst):
            continue
        src = os.path.join(SRC, name)
        if name in ("lineitem.parquet", "orders.parquet"):
            t = pq.read_table(src)
            pq.write_table(t, dst, row_group_size=1 << 31)
            print(f"packed {name}: rows={t.num_rows} "
                  f"row_groups={pq.ParquetFile(dst).metadata.num_row_groups}")
        else:
            os.symlink(src, dst)
    print("packed sf1 at", PACKED)


def run(mode: str) -> None:
    from flat_file_social_media_database_engine_spark.session import build_session
    from flat_file_social_media_database_engine_spark.sources import catalog

    if mode == "off":
        catalog._relayout = lambda spark, sf_dir, name, df, path: df
    import __spark_entry__ as entry

    spark = build_session(f"relayout-receipt-{mode}")
    qs = entry.queries()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for name in QUERIES:
        walls = []
        for k in range(4):
            t0 = time.time()
            qs[name](spark, PACKED).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        print(
            f"relayout={mode} cpus={cpus} {name}: cold={walls[0]} "
            f"warm={walls[1:]} warm_min={min(walls[1:]):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[2] if len(sys.argv) > 2 else "on")
