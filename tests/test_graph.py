"""Large-star/small-star connected components: O(log n) convergence
on the adversarial (chain) topology, multi-component labeling, and
the non-convergence guard (round-2 advice: never return silently
wrong labels past an iteration cap)."""

from __future__ import annotations

import math

import pytest

from flat_file_social_media_database_engine_spark.operators.graph import (
    ConvergenceError,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_converges_in_log_rounds(spark):
    # A 200-node chain is the worst case for plain min-label
    # propagation (needs 199 rounds — the round-2 implementation
    # capped at 20 and returned wrong labels). The star algorithm
    # must label it correctly within 2*log2(n) rounds.
    n = 200
    labels, rounds = connected_components(
        _edges(spark, [(i, i + 1) for i in range(n - 1)])
    )
    got = {r["node"]: r["label"] for r in labels.collect()}
    # node 0 is the component min (the root): it never appears as a
    # labeled node; every other node must map to 0.
    assert got == {i: 0 for i in range(1, n)}
    assert rounds <= 2 * math.log2(n)


def test_multiple_components_and_shapes(spark):
    pairs = (
        [(i, i + 1) for i in range(5)]  # chain 0..5
        + [(10, 11), (11, 12), (10, 12)]  # triangle
        + [(20, 21)]  # lone pair
        + [(30, 31), (30, 32), (30, 33)]  # star already
    )
    labels, _ = connected_components(_edges(spark, pairs))
    got = {r["node"]: r["label"] for r in labels.collect()}
    expect = {i: 0 for i in range(1, 6)}
    expect.update({11: 10, 12: 10, 21: 20, 31: 30, 32: 30, 33: 30})
    assert got == expect


def test_empty_and_self_loop_edges(spark):
    labels, rounds = connected_components(
        _edges(spark, [(7, 7)])  # self-loops vanish in canonicalization
    )
    assert labels.count() == 0 and rounds == 0


def test_round_cap_raises_instead_of_wrong_labels(spark):
    with pytest.raises(ConvergenceError):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(199)]), max_rounds=1
        )
