"""State-partition curve for ``events_stream_sessionize`` under BOTH
drain shapes (round-8 verdict item 8: attribution has the 7.5→2.5 s
curve that justified stream_state_partitions=8; sessionize had only
the one 8-partition point, and only on the single-batch drain).

Measures, at sf0.1, cold stream-execution walls (fresh checkpoint +
sink per run, min-of-2) for the session_window aggregation:

- drain shapes: ``single`` (the driver entry's consolidated one-real-
  file stage) and ``multi`` (the production shape: one file per ISO
  week, maxFilesPerTrigger=1 — watermark advances between batches) —
  both ending in the two sentinel drain files so append-mode state
  FINALIZES.
- state partitions: 4 / 8 / 16 / 32 (SPARK_GRAFT_STREAM_PARTITIONS,
  read at every stream start).

Also asserts the two shapes' result SETS are identical at every
setting — the receipt is walls + equivalence, not walls alone.

Usage: python tools/stream_knob.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTITIONS = [4, 8, 16, 32]


def _multi_batch_stage(spark, sf_dir: str) -> tuple[str, int]:
    """Weekly event-time-ordered files + the two sentinel drain files,
    mtimes strictly increasing (file source runs oldest-first)."""
    from flat_file_social_media_database_engine_spark.streaming import (
        events as SE,
    )

    weekly, n = SE.stage_events_daily(spark, sf_dir, unit="week")
    sent = SE.stage_events_with_sentinels(spark, sf_dir)
    stage = tempfile.mkdtemp(prefix="knob_multi_")
    t0 = 1_700_000_000
    names = sorted(os.listdir(weekly))
    for i, f in enumerate(names):
        dst = os.path.join(stage, f"{i:02d}_week.parquet")
        shutil.copy(os.path.join(weekly, f), dst)
        os.utime(dst, (t0 + i, t0 + i))
    for j, f in enumerate(sorted(
        x for x in os.listdir(sent) if x.startswith("zz_sentinel")
    )):
        dst = os.path.join(stage, f)
        shutil.copy(os.path.join(sent, f), dst)
        os.utime(dst, (t0 + 10_000 + j, t0 + 10_000 + j))
    return stage, len(names)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )
    from flat_file_social_media_database_engine_spark.streaming import (
        events as SE,
    )

    spark = build_session("streamknob")
    single_stage = SE.stage_events_with_sentinels(spark, sf_dir)
    multi_stage, n_weeks = _multi_batch_stage(spark, sf_dir)
    print(f"multi-batch stage: {n_weeks} weekly files + 2 sentinels")

    schema = (
        "user_id bigint, session_start timestamp,"
        " session_end timestamp, n_events bigint"
    )

    def run(stage: str, mft: int) -> tuple[float, frozenset]:
        sess = SE.sessionize(
            SE.read_staged_events_stream(
                spark, stage, max_files_per_trigger=mft
            )
        )
        t0 = time.time()
        got = SE.run_stream_to_parquet(sess, "knob_sess_", schema)
        rows = frozenset(
            tuple(r)
            for r in got.filter(
                ~got["user_id"].eqNullSafe(SE.SENTINEL_USER)
            ).collect()
        )
        return round(time.time() - t0, 2), rows

    out: dict = {"n_weeks": n_weeks, "walls": {}}
    baseline_rows = None
    for p in PARTITIONS:
        os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = str(p)
        for shape, stage, mft in (
            ("single", single_stage, 1_000_000),
            ("multi", multi_stage, 1),
        ):
            walls = []
            for _ in range(2):
                w, rows = run(stage, mft)
                walls.append(w)
            if baseline_rows is None:
                baseline_rows = rows
            assert rows == baseline_rows, (
                f"result drift at partitions={p} shape={shape}: "
                f"{len(rows)} vs {len(baseline_rows)} rows"
            )
            out["walls"][f"{shape}@{p}"] = {
                "min": min(walls), "runs": walls,
            }
            print(
                f"sessionize {shape:6s} partitions={p:2d} "
                f"runs={walls} rows={len(rows)}",
                flush=True,
            )
    out["rows"] = len(baseline_rows)
    print("STREAMKNOB_JSON " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
