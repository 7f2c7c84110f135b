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
#   _VERIFY_FIRST — queries that are new or changed this round, then
#     the queries whose most recent driver-green row is OLDEST, until
#     the 50-slot window is full (freshness rotation: after round 4,
#     every query has at least one driver-green row, so the head is
#     now re-confirmations ranked by staleness).
#   _STABLE_TAIL  — recently driver-verified (r4) and untouched this
#     round; these absorb the overflow past slot 50.
# Everything else keeps its module registration order in between.
_VERIFY_FIRST = [
    # --- CHANGED round 9: dedup_incremental_persisted's probe is now
    # fully batch-sized (signs docs.filter(bcond) directly, hot cap
    # from committed band_counts + batch counts, verify against
    # committed corpus_shingles — verdict item 3);
    # dedup_prefix_jaccard's verify tail was extracted for the new
    # disk-bounded pass mode (plan unchanged, re-verify anyway). ---
    # --- NEW round 9 (first verification): the streaming ingest
    # classifier (foreachBatch probe of the committed band index,
    # exactly-once batch-marker sink, corpus-only-cap contract). ---
    "docs_stream_ingest_dedup",
    "dedup_incremental_persisted",
    "dedup_prefix_jaccard",
    # exact medians rewritten onto rank_select (the builtin median's
    # value-buffering aggregate OOM'd the sf100 battery) — re-verify
    "a5_median_totalprice",
    "a5_approx_median",
    # --- STALENESS ROTATION (round-8 verdict item 7): the 42 queries
    # whose last driver-green row is round 6 — freshness policy says
    # nothing staler than 2 rounds. events_stream_ingest leads (it
    # yielded its round-8 slot despite a code touch). ---
    "events_stream_ingest",
    "o3_window_suite",
    "m2_validated_append",
    "m4_delete_upsert",
    "m5_snapshot_diff",
    "s5_snapshot_roundtrip",
    "s8_rollup_maintenance",
    "q_above_customer_avg",
    "a2_orders_cube",
    "docs_pack_sequences",
    "sample_train_split",
    "text_bigram_lm_score",
    "text_pii_scrub",
    "dedup_span_exact",
    "sim_neardup_cosine",
    "sim_neardup_lsh",
    "sim_kmeans_assign",
    "sim_topk_ivf_kmeans",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    "sim_semantic_dedup",
    "sim_dim_stats",
    "events_sessionize",
    "events_sliding_rollup",
    "events_sessionize_twophase",
    "events_retention",
    "events_range_attribution",
    "events_pivot_daily",
    "events_anomaly_zscore",
    "events_dedup_redelivery",
    "events_next_transition",
    "events_daily_gapfill",
    "events_top_paths",
    "events_heavy_hitters",
    "events_bitmap_retention",
    "events_interarrival_stats",
    "events_session_stats",
    "events_dau_rolling",
    "mm_payload_stats",
    "mm_decode_features",
    "mm_resize_stats",
    "mm_frame_stats",
    # --- r7-cohort fills: the window holds exactly 50; these three
    # are the head of the r7-green cohort (next-oldest after the r6
    # set), pulled forward so the round-10 rotation owes 32, not 35. ---
    "sim_pca_project",
    "sim_modality_coverage",
    "sim_topk_lsh",
]
_STABLE_TAIL = [
    # --- r7-green remainder: leads the round-10 rotation (they will
    # be 2 rounds stale after this round — at the policy limit). The
    # r8-green cohort keeps module registration order in the mid. ---
    "sim_topk_lsh_multiprobe",
    "sim_recall_audit",
    "sim_topk_ivf_persisted",
    "dedup_source_stats",
    "dedup_incremental",
    "dedup_bloom_prefilter",
    "sim_embedding_stats",
    "sim_centroid_outliers",
    "docs_chunk_overlap",
    "docs_domain_budget",
    "pipeline_training_mix",
    "text_tfidf_topk",
    "a1_conditional_counts",
    "a2_orders_rollup",
    "a3_approx_distinct",
    "a3_distinct_counts",
    "a4_existence_checks",
    "dedup_simhash",
    "e1_intersect_custkeys",
    "e2_except_custkeys",
    "events_asof_attribution",
    "events_funnel",
    "events_json_extract",
    "j5_ri_sweep",
    "m3_rekey_cascade_orders",
    "q2_engagements_by_segment",
    "s3_ri_filter_orders",
    "s7_multiformat_union",
    "sample_stratified",
    "text_bpe_token_count",
]


def load_all() -> None:
    from . import parity  # noqa: F401
    from . import analytics  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import eventflow  # noqa: F401
    from . import multimodal  # noqa: F401

    # A typo'd name must fail LOUDLY: silently filtering it out would
    # shrink the driver's 50-query verification window — exactly the
    # coverage-lie class the round-2 verdict flagged. Same for a name
    # listed twice or placed in both lists (the dict rebuild would
    # dedup it silently and shift every later slot).
    unknown = [
        n for n in [*_VERIFY_FIRST, *_STABLE_TAIL] if n not in QUERIES
    ]
    if unknown:
        raise KeyError(f"registration lists name unknown queries: {unknown}")
    dupes = [
        n
        for n in {*_VERIFY_FIRST, *_STABLE_TAIL}
        if _VERIFY_FIRST.count(n) + _STABLE_TAIL.count(n) > 1
    ]
    if dupes:
        raise KeyError(f"queries listed more than once: {sorted(dupes)}")
    head = list(_VERIFY_FIRST)
    tail = list(_STABLE_TAIL)
    placed = set(head) | set(tail)
    mid = [n for n in QUERIES if n not in placed]
    order = head + mid + tail
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    oracle_order = {n: ORACLE[n] for n in order if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(oracle_order)
