"""Scale receipt for the round-9 streaming entry
``docs_stream_ingest_dedup`` (SCALING.md decade 2/3): run the full
streaming path — distributed batch staging, foreachBatch probe of the
committed band index, exactly-once batch-marker appends — at sf10
(500k docs) and sf100 (5M docs) and report wall + classified-row
counts per tier.

The interesting number is the END-TO-END wall including staging: the
round-9 distributed stager rewrite (rank-select boundaries + per-range
Spark writes) exists precisely because the first cut's driver-side
``toPandas`` aborted on ``driver.maxResultSize`` at the 5M-doc tier,
so this receipt is also the regression gate for that fix.

Usage: SPARK_GRAFT_DRIVER_MEM=40g python tools/stream_ingest_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = {
    "sf10": os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10"),
    "sf100": os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100"),
}


def main() -> int:
    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )
    from flat_file_social_media_database_engine_spark.workloads import (
        dedup as D,
    )

    spark = build_session("stream_ingest_scale")
    out: dict[str, dict[str, float | int]] = {}
    for tier, sf_dir in TIERS.items():
        if not os.path.isdir(sf_dir):
            print(f"SKIP {tier}: {sf_dir} missing")
            continue
        t0 = time.time()
        res = D.docs_stream_ingest_dedup(spark, sf_dir)
        agg = {
            r["status"]: r["n"]
            for r in res.groupBy("status").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        wall = time.time() - t0
        out[tier] = {"wall_s": round(wall, 2), **agg}
        print(f"RESULT {tier} docs_stream_ingest_dedup: {wall:.2f}s {agg}")
    print("STREAM_INGEST_SCALE_JSON " + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
