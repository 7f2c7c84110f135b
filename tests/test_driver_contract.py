"""Driver-environment contract, pinned as a test.

The round driver imports ``__spark_entry__`` into its OWN plain
SparkSession — none of ``session.py``'s configs (UTC timezone,
nanosAsLong, Arrow, AQE) are set unless query code sets them at
runtime. Config-dependence bugs therefore never show up in the
engine's own suites (which use ``build_session``); they show up in
the driver. This test launches a FRESH subprocess that builds the
same plain session the driver does and runs ``entry()`` plus one
representative query per config-sensitive family:

- events (TIMESTAMP(NANOS) parquet → needs the runtime nanosAsLong +
  UTC conversion inside ``read_table``, not session-build configs),
- multimodal (Arrow ``mapInPandas`` decode),
- dedup LSH (Arrow pandas_udf signatures + session caches, and the
  downstream-consumer-first call order that once deadlocked),
- a store-mutating query (snapshot commit protocol under a plain
  session),
- a DECIMAL-aggregation query (timezone/precision discipline).

A subprocess (not the shared test session) is the point: the shared
session already carries the engine configs.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

assert len(e.entry(spark).collect()) >= 0
qs = e.queries()
SAMPLE = [
    "events_sessionize",        # nanos timestamp + UTC runtime conf
    "events_daily_gapfill",     # date spine arithmetic under plain tz
    "mm_decode_features",       # Arrow mapInPandas codec path
    "dedup_clusters",           # consumer-FIRST session-cache order
    "s8_rollup_maintenance",    # store commit protocol, IVM fold
    "q_pricing_summary",        # DECIMAL aggregation discipline
    "events_stream_clamp",      # stateful streaming: runtime UTC conf,
                                # Arrow applyInPandasWithState, replay
                                # staging + checkpoint under plain session
]
for name in SAMPLE:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"ok {name} rows={n}", flush=True)
print("DRIVER_CONTRACT_OK")
"""


def test_plain_session_driver_contract():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"plain-session contract run failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-3000:]}"
    )
    assert "DRIVER_CONTRACT_OK" in proc.stdout
