"""Spill-safe eager materialization for shared expensive intermediates.

Why not ``localCheckpoint(eager=True)`` (round-2 verdict item): local
checkpoints are EXECUTOR-LOCAL — blocks live only in the executors'
block managers with no lineage left to recompute them, so at cluster
scale one lost executor aborts the whole job. ``persist(DISK_ONLY)``
keeps the lineage: a lost block is recomputed from source, which is
the fault-tolerance story a 100 TB run needs, and DISK_ONLY keeps
corpus-sized intermediates out of executor heap entirely (they stream
from local spill files on re-read).

Why the ``count()`` barrier: a LAZY persist is not enough when several
consumers run as concurrent stages of one downstream job — the stages
race past the still-unpopulated cache and each recomputes the full
lineage (measured in round 1: tokenize+shingle ran once per branch).
The count action populates every partition of the cache BEFORE any
consumer plan is submitted, so all branches read blocks, not lineage.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(
    df: DataFrame, storage_level: StorageLevel = StorageLevel.DISK_ONLY
) -> DataFrame:
    """Persist ``df`` at ``storage_level`` (default DISK_ONLY) and run
    an eager ``count()`` barrier so every consumer reads cached blocks.

    The returned DataFrame keeps its lineage — recomputable after
    block loss, unlike ``localCheckpoint``."""
    out = df.persist(storage_level)
    out.count()
    return out
