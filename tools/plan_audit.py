"""Plan audit: dump every driver query's physical-plan posture —
parquet scan columns (pruning), pushed filters, exchange (shuffle)
count, and whether a forced broadcast appears — so plan regressions
are visible at review time, not at cluster time.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from flat_file_social_media_database_engine_spark.session import build_session

    spark = build_session("plan-audit")
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:
            print(f"{name}: ERROR {exc}")
            continue
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pushed = [
            p
            for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if p.strip()
        ]
        # formatted explain puts the partitioning on the Arguments
        # line below the node header — count node headers
        n_shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
        cols = [len([c for c in s.split(",") if ":" in c]) for s in scans]
        print(
            f"{name}: scans={len(scans)} cols/scan={cols} "
            f"shuffles={n_shuffles} broadcasts={n_bcast} "
            f"pushed={len(pushed)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
