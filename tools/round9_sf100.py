"""Round-9 sf100 receipts, one controlled session (SCALING.md decade 3):

1. CONTROLLED RETEST of the gram-family walls (round-8 verdict item 2:
   dedup_span_exact measured 89.1 s vs r7's 23.0 s on a sibling-session
   noise claim — settle it): for each flagged query, clearCache +
   reset_session_caches, then back-to-back min-of-3 at sf10 and sf100.
   All three raw runs are recorded, not just the min, so the variance
   claim is itself a receipt.
2. FIXED-BATCH PROBE RECEIPT under the round-9 batch-signing rewrite
   (verdict item 3): constant 50k-doc batch against the committed band
   index at both tiers; run1 (cold: index build + batch signing) and
   run2 (warm probe) reported separately — the warm probe is the
   claim ("~flat across tiers"), the cold run is the amortized build.
3. The disk-bounded exact prefix join's first sf100 COMPLETION
   (verdict item 4): dedup_prefix_jaccard_bounded in key-space residue
   passes, transient shuffle bounded at ~1/passes of the prefix table;
   reports wall, verified pair count, and disk headroom before/after.

Usage: SPARK_GRAFT_DRIVER_MEM=40g python tools/round9_sf100.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")

RETEST = [
    "dedup_span_exact",
    "pipeline_dedup_corpus",
    "docs_strip_dup_spans",
    "o1_multikey_sort",
    "events_sessionize",
]

PREFIX_PASSES = 16


def _disk_free_gb(path: str = "/tmp") -> float:
    return shutil.disk_usage(path).free / 2**30


def main() -> int:
    import __spark_entry__ as entry
    from flat_file_social_media_database_engine_spark.plans.materialize import (
        reset_session_caches,
    )
    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )
    from flat_file_social_media_database_engine_spark.workloads import (
        dedup as D,
    )

    spark = build_session("round9sf100")
    qs = entry.queries()
    out: dict = {"retest": {}, "fixed_batch": {}, "prefix_bounded": {}}

    # --- 1. controlled retest --------------------------------------
    for n in RETEST:
        out["retest"][n] = {}
        for sf_dir, tag in ((SF10, "sf10"), (SF100, "sf100")):
            spark.catalog.clearCache()
            reset_session_caches()
            runs = []
            for _ in range(3):
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 2))
            out["retest"][n][tag] = {"min": min(runs), "runs": runs}
            print(f"retest {tag:6s} {n:26s} runs={runs}", flush=True)
        a = out["retest"][n]["sf10"]["min"]
        b = out["retest"][n]["sf100"]["min"]
        print(f"retest ratio  {n:26s} {a:.2f} -> {b:.2f} = {b/a:.1f}x",
              flush=True)

    # --- 2. fixed-batch probe receipt -------------------------------
    for sf_dir, tag in ((SF10, "sf10"), (SF100, "sf100")):
        spark.catalog.clearCache()
        reset_session_caches()
        D._BAND_INDEX_CACHE.clear()
        runs = []
        for _ in range(2):
            t0 = time.time()
            D.dedup_incremental_persisted(
                spark, sf_dir, batch_hi=D.N_OLD + 50_000
            ).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
        out["fixed_batch"][tag] = {"cold": runs[0], "warm": runs[1]}
        print(f"fixed-batch probe (50k) {tag}: cold={runs[0]}s "
              f"warm={runs[1]}s", flush=True)

    # --- 3. bounded prefix join at sf100 -----------------------------
    spark.catalog.clearCache()
    reset_session_caches()
    free0 = _disk_free_gb()
    t0 = time.time()
    pairs = (
        D.dedup_prefix_jaccard_bounded(spark, SF100, passes=PREFIX_PASSES)
        .count()
    )
    wall = round(time.time() - t0, 1)
    out["prefix_bounded"] = {
        "passes": PREFIX_PASSES,
        "pairs": pairs,
        "wall": wall,
        "disk_free_gb_before": round(free0, 1),
        "disk_free_gb_after": round(_disk_free_gb(), 1),
    }
    print(
        f"prefix bounded sf100: pairs={pairs} wall={wall}s "
        f"disk {free0:.1f} -> {_disk_free_gb():.1f} GB free",
        flush=True,
    )

    print("ROUND9_JSON " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
