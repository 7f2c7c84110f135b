"""Targeted query timing: cold + N warm noop-sink walls in one fresh
session, for before/after A-B of individual optimizations.

Usage: python tools/qtime.py <query> [query ...] [--warm N] [--sf DIR]
Prints one line per query: cold wall then the warm walls (min last).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    warm_n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--warm":
            warm_n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entry
    from flat_file_social_media_database_engine_spark.session import build_session

    spark = build_session("qtime")
    qs = entry.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        walls = []
        for k in range(1 + warm_n):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        warm = walls[1:]
        wmin = f" warm_min={min(warm):.3f}" if warm else ""
        print(f"{name}: cold={walls[0]} warm={warm}{wmin}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
