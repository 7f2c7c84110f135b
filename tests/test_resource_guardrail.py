"""Resource-ceiling guardrail — the Spark twin of reference Test 9
(buzzdb_lab1.cpp:1510-1550: the whole load+query harness must finish
under a wall ceiling and bounded memory, asserted as a test, not a
benchmark note).

A fresh subprocess runs the three heaviest headline queries
(sim_neardup_lsh — LSH-bucketed self-join over signatures;
dedup_clusters — iterative checkpointed connected components;
orders_market_basket — data-sized basket shuffle + DISK_ONLY
materialize + map-side pair expansion, the round-5 addition) on a
JVM deliberately capped far below the dev default (1g driver heap vs
128g on the bench host, local mode so driver == executors). The
assertion is completion: under a bounded heap Spark must SPILL
(sort/aggregate spill files, DISK_ONLY persists) rather than OOM —
the "survives constrained memory" property the reference enforces
with its RSS-growth check. A wall ceiling guards against the other
failure mode (thrash-forever instead of dying).

The subprocess is required: driver-memory is a JVM launch option, so
it cannot be exercised inside the already-running test session.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("guardrail")
    .config("spark.driver.memory", "1g")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
# the cap must actually be in force, or the test proves nothing
assert spark.conf.get("spark.driver.memory") == "1g"

from flat_file_social_media_database_engine_spark.workloads import (
    QUERIES,
    load_all,
)

load_all()
for name in ("sim_neardup_lsh", "dedup_clusters", "orders_market_basket"):
    QUERIES[name](spark, {sf_dir!r}).write.format("noop").mode(
        "overwrite"
    ).save()
    print("GUARDRAIL_OK", name, flush=True)
"""

# Generous vs the ~45s warm cost of these queries: the ceiling exists
# to catch a thrash/livelock regression (minutes), not to benchmark —
# a noisy-neighbor double-up must not flake the suite.
WALL_CEILING_S = 420


def test_heavy_queries_complete_under_1g_heap():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CHILD.format(repo=repo, sf_dir="/root/testdata/sf0.01")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=WALL_CEILING_S,
        cwd=repo,
    )
    wall = time.time() - t0
    assert proc.returncode == 0, (
        f"constrained-memory run failed (rc={proc.returncode}):\n"
        f"{proc.stderr[-4000:]}"
    )
    assert proc.stdout.count("GUARDRAIL_OK") == 3, proc.stdout
    assert "OutOfMemoryError" not in proc.stderr
    assert wall < WALL_CEILING_S
