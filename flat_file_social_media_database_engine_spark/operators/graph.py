"""Distributed connected components: alternating large-star/small-star.

The round-2 engine ran plain min-label propagation — O(diameter)
rounds, which silently mislabels chain-shaped components longer than
the iteration cap. This is the O(log)-round replacement: the
alternating star algorithm from the public MapReduce literature
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014). Reference parity: the reference engine has no graph
operator — this backs ``dedup_clusters``' transitive closure over
near-dup pairs, whose oracle is a recursive CTE.

Per round, both operations are one shuffle each (a groupBy on one
endpoint) over the CURRENT edge set — which the algorithm itself
keeps shrinking toward one star edge per non-root node, so rounds get
cheaper as they go. No step ever materializes neighborhoods as
arrays, no driver-side graph state; the only driver values are the
per-round edge count and a one-row containment probe for the
convergence test.

Fixed points of (large-star ∘ small-star) are exactly forests of
min-rooted stars, so at convergence every non-root node holds exactly
one edge (node, component_min) — the label table IS the edge set.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Connected components hit the round cap before the edge set
    stabilized — raised instead of returning silently-wrong labels
    (round-2 advice: the propagation cap used to do exactly that)."""


def _reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` to RELIABLE storage, truncating the
    logical plan.

    Why not ``persist``: each star round references the previous
    round's frame ~4 times (symmetrize + the min join), so with
    lineage kept the analyzed plan grows ~4^rounds and the DRIVER
    OOMs analyzing it long before any data problem. Why not
    ``localCheckpoint``: executor-local blocks have no recompute path
    — one lost executor aborts a cluster-scale job. A reliable
    checkpoint writes the round's edge set to the checkpoint
    directory (shared storage — HDFS/object store — on a real
    cluster; the local FS tmpdir here) and restarts lineage from it:
    flat plans AND survivable executor loss. Round outputs shrink
    toward one star edge per node, so the per-round write is bounded
    by the (already LSH-bucket-bounded) pair set, not the corpus."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(
            os.path.join(
                tempfile.gettempdir(), "spark-graft-checkpoints", sc.applicationId
            )
        )
    return df.checkpoint(eager=True)


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (src > dst) pairs, self-loops
    dropped — the orientation both star steps emit."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to u's neighborhood min:
    emit (v, min(Γ⁺(u))) for v ∈ Γ(u), v > u. Output stays canonical
    (v > u ≥ min)."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("src", "_mn").alias("_m"))
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Group edges by their LARGER endpoint u; connect u and all its
    ≤-neighbors to their collective min: emit (v, m) for
    v ∈ Γ⁻(u) ∪ {u}, m = min(Γ⁻(u))."""
    o = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    m = o.groupBy("u").agg(F.min("v").alias("_m"))
    nbrs = o.join(m, "u").select(F.col("v").alias("src"), F.col("_m").alias("dst"))
    selfs = m.select(F.col("u").alias("src"), F.col("_m").alias("dst"))
    return (
        nbrs.union(selfs).filter(F.col("src") != F.col("dst")).distinct()
    )


def _probe(df: DataFrame) -> tuple[int, int]:
    """(count, order-free xor checksum) of an edge set in ONE job —
    the per-round convergence probe. Replaces the count + exceptAll
    pair (two jobs, one with a full shuffle): on graphs whose edge
    set has shrunk to thousands of star edges, per-round cost is
    scheduler-dominated, so halving the jobs halves the round.
    Distinct sets with equal (count, xor) are a ~2⁻⁶⁴ accident, and
    the final star-forest guard still structurally validates the
    stopping state."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("sig"),
    ).collect()[0]
    return int(row["n"]), row["sig"] if row["sig"] is not None else 0


def connected_components(
    edges: DataFrame, max_rounds: int | None = None
) -> tuple[DataFrame, int]:
    """Labels for every node appearing in ``edges`` (columns
    ``src``/``dst``): returns ``((node, label) DataFrame, rounds)``
    where ``label`` is the component's minimum node id. Root nodes
    (the minima themselves) and isolated nodes do NOT appear — the
    caller left-joins and coalesces to the node's own id.

    Each round's edge set is RELIABLY checkpointed (see
    ``_reliable_checkpoint`` — flat plans, survivable executor loss)
    and probed with a single-job count+checksum (see ``_probe`` — a
    scalar fetch, never a data collect). Raises
    :class:`ConvergenceError` at the round cap (default
    ``2·log2(|E|) + 6`` — alternation converges in O(log n) rounds on
    real graphs, and the planted-chain test pins ≤ 2·log2(n)); wrong
    labels are never returned silently."""
    cur = _reliable_checkpoint(_canonical(edges))
    cur_n, cur_sig = _probe(cur)
    if max_rounds is None:
        max_rounds = 2 * math.ceil(math.log2(max(cur_n, 2))) + 6
    rounds = 0
    while cur_n > 0:
        if rounds >= max_rounds:
            raise ConvergenceError(
                f"connected_components: edge set not stable after "
                f"{rounds} rounds (cap {max_rounds})"
            )
        rounds += 1
        # Size the round's layout to the CURRENT edge count (a scalar
        # the probe already paid for): ~200k edges per partition, so a
        # contracted graph checkpoints as a handful of files instead
        # of parallelism-many near-empty tasks, while a 100 TB edge
        # set still spreads to the cluster's full width.
        p = max(1, min(
            cur.sparkSession.sparkContext.defaultParallelism,
            cur_n // 200_000 + 1,
        ))
        nxt = _reliable_checkpoint(_small_star(_large_star(cur)).repartition(p))
        nxt_n, nxt_sig = _probe(nxt)
        stable = (nxt_n, nxt_sig) == (cur_n, cur_sig)
        cur, cur_n, cur_sig = nxt, nxt_n, nxt_sig
        if stable:
            break
    # At the fixed point every non-root node carries exactly one edge
    # to the component min. Verify the star shape instead of assuming
    # it: a node with two distinct targets means the loop stopped on a
    # non-star fixed point, and labels would be silently wrong.
    multi = (
        cur.groupBy("src")
        .agg(F.countDistinct("dst").alias("deg"))
        .filter(F.col("deg") > 1)
        .limit(1)
        .count()
    )
    if multi:
        raise ConvergenceError(
            "connected_components: stable edge set is not a star forest"
        )
    labels = cur.select(F.col("src").alias("node"), F.col("dst").alias("label"))
    return labels, rounds
