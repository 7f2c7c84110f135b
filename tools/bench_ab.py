"""A/B attribution for the round-8 warm-bench doubling of
dedup_pagerank (1.13 → 2.36 s) and dedup_keep_central (2.01 → 3.01 s)
at sf0.1 (round-8 verdict item 5).

Hypothesis under test: the r8 band-signature sharing moved shared-pass
build cost into whichever query touches the pass first in bench order,
and the bench's min-of-2 for these two entries reports a wall that
still carries neighbor/cache-manager state rather than the queries'
own work.

Protocol (one session, sf0.1):
  A. bench-shaped: run the full HEADLINE pass 1 + pass 2 exactly like
     bench.py, record the two entries' pass-2 walls.
  B. isolated-warm: immediately after, run each entry 5 more times in
     the same warm session; record min and all runs.
  C. fresh-order: clearCache + reset_session_caches, then build ONLY
     the entries' own dependency chain (lsh pairs → pagerank table)
     and re-measure 3 runs.
If B/C minima sit well under the bench pass-2 wall, the bench number
is position noise / cache-manager pressure, not query cost; if they
match, the regression is real and in the query's own plan.

Usage: python tools/bench_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
TARGETS = ["dedup_pagerank", "dedup_keep_central"]


def main() -> int:
    import bench
    import __spark_entry__ as entry
    from flat_file_social_media_database_engine_spark.plans.materialize import (
        reset_session_caches,
    )
    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )

    spark = build_session("benchab")
    qs = entry.queries()

    def run(n: str) -> float:
        t0 = time.time()
        qs[n](spark, SF).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out: dict = {}

    # A. bench-shaped: JIT warm at sf0.001, then two full passes
    for name in bench.HEADLINE:
        if name in qs:
            try:
                qs[name](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:
                pass
    p2 = {}
    for _pass in range(2):
        for name in bench.HEADLINE:
            if name not in qs or name in bench.STREAM_COLD:
                continue
            dt = run(name)
            if _pass == 1 and name in TARGETS:
                p2[name] = dt
    out["bench_pass2"] = p2
    print(f"A bench pass-2: {p2}", flush=True)

    # B. isolated-warm repeats in the same session
    out["isolated_warm"] = {}
    for n in TARGETS:
        runs = [run(n) for _ in range(5)]
        out["isolated_warm"][n] = {"min": min(runs), "runs": runs}
        print(f"B isolated-warm {n}: {runs}", flush=True)

    # C. fresh dependency chain only
    spark.catalog.clearCache()
    reset_session_caches()
    out["fresh_chain"] = {}
    for n in TARGETS:
        runs = [run(n) for _ in range(3)]
        out["fresh_chain"][n] = {"min": min(runs), "runs": runs}
        print(f"C fresh-chain {n}: {runs}", flush=True)

    print("BENCHAB_JSON " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
