"""Top-k per key with a map-side combiner.

Spark has no partial aggregation for window ``row_number`` — a
``Window.partitionBy(key).orderBy(...)`` top-k shuffles EVERY row to
the key's reducer and sorts there, even though all but k rows per key
per input split can never survive. (``collect_list``-based rewrites
don't help: its partial state is the unpruned list.) This module adds
the missing combiner: an Arrow-batched, batch-local top-k prune that
runs BEFORE the shuffle and is exact by a superset argument —

  any row outside its batch's top-k for its key is outranked by k
  rows of the same key that travel with it, so it cannot be in the
  global top-k; dropping it never changes the window's answer.

Rows with NULL in any ordering column are never pruned (pandas and
Spark disagree on null placement; forwarding them costs at most the
null rows and keeps the prune conservative), and the prune keys on
the FULL ordering including the caller's tiebreaks, so ties at the
batch boundary are kept deterministically.

At 100 TB this turns the window's shuffle from O(rows) to
O(k · keys-per-batch · batches) — for a domain-cap query, from "every
document" to "~k documents per domain per input split" — while the
final window (unchanged, JVM-side) still decides every rank.

Reference lineage: generalizes the reference's per-user GROUP BY +
bounded-selection shapes (buzzdb_lab1.cpp:682-773); the oracle twin
of any consumer stays the plain SQL window.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prune_topk_batches(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Batch-local top-k prune (the map-side combiner). Returns a
    SUPERSET of the global per-key top-k under ``order_by``
    (``[(col, ascending), ...]`` — must be a total order, i.e. end
    with a unique tiebreak, for the downstream window to be
    deterministic). Map-only: no shuffle, schema unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sort_cols = [c for c, _ in order_by]
    ascending = [asc for _, asc in order_by]
    schema = df.schema

    def prune(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            null_any = pdf[sort_cols].isna().any(axis=1)
            safe = pdf[~null_any]
            kept = (
                safe.sort_values(sort_cols, ascending=ascending, kind="mergesort")
                .groupby(key_cols, sort=False)
                .head(k)
            )
            out = pd.concat([kept, pdf[null_any]]) if null_any.any() else kept
            yield out

    return df.mapInPandas(prune, schema)


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[tuple[Column, str, bool]],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact global top-k per key: batch-local prune, then the plain
    window ranks the survivors. ``order_by`` is
    ``[(expr, projected_name, ascending), ...]`` — expressions are
    projected so the pandas prune and the window sort the same
    values; a ``projected_name`` already present in ``df`` must
    denote that column unchanged (it is not re-projected); the last
    entry must be a unique tiebreak. Output: the pruned-in rows'
    original columns + ``rank_col`` (bigint, 1-based).
    """
    proj = df.select(
        "*", *[e.alias(n) for e, n, _ in order_by if n not in df.columns]
    )
    pruned = prune_topk_batches(
        proj, key_cols, [(n, asc) for _, n, asc in order_by], k
    )
    w = Window.partitionBy(*key_cols).orderBy(
        *[
            F.col(n).asc() if asc else F.col(n).desc()
            for _, n, asc in order_by
        ]
    )
    return (
        pruned.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
        .drop(*[n for _, n, _ in order_by if n not in df.columns])
    )
