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
    # --- NEW round 5 (first verification) ---
    "sample_temperature_mix",  # sqrt-temperature lang rebalance
    "orders_market_basket",    # pairwise part lift, capped baskets
    "pipeline_pretrain_mix",   # capstone: filter→dedup→temp→budget
    "dedup_simhash_pairs",     # Manku-style banded Hamming near-dup
    # --- CHANGED round 5: rank_select gained the group spine for
    # all-out-of-range cuts (operators/rankselect.py) — its two
    # consumers must re-verify under the new plan ---
    "orders_rfm_segments",
    "events_value_percentiles",
    # --- CHANGED round 5: s7 gained an ORC fourth slice ---
    "s7_multiformat_union",
    # --- STALENESS ROTATION: the 41 queries whose last driver-green
    # row is round 2 (every other query is r3/r4-green). Order within
    # the band is immaterial; grouped by module for readability. ---
    "q_pricing_summary",
    "q_region_revenue",
    "q_top_revenue_orders",
    "a1_conditional_counts",
    "a2_orders_per_customer",
    "a2_orders_rollup",
    "a3_distinct_counts",
    "a3_approx_distinct",
    "a4_existence_checks",
    "a5_median_totalprice",
    "a5_approx_median",
    "e1_intersect_custkeys",
    "e2_except_custkeys",
    "j2_chained_ri_lineitem",
    "j5_ri_sweep",
    "o1_multikey_sort",
    "p3_filter_project",
    "p5_point_lookup",
    "p6_p7_trim_strict_cast",
    "s3_ri_filter_orders",
    "q1_user_events",
    "q2_engagements_by_segment",
    "m1_apply_price_deltas",
    "m3_rekey_cascade_orders",
    "dedup_exact",
    "dedup_simhash",
    "text_token_freq",
    "text_fingerprint",
    "text_source_stats",
    "text_repetition_ratio",
    "text_langid",
    "text_bpe_token_count",
    "text_quality_score",
    "text_commonness_score",
    "pipeline_clean_corpus",
    "sample_stratified",
    "docs_pack_sequences",
    "sim_topk_ivf",
    "sim_topk_bruteforce",
    "events_json_extract",
    "events_hourly_rollup",
    # --- r3-green re-confirmations filling the window to exactly 50:
    # chosen from the r3 band's entries that bench.py does NOT track
    # per round (the bench-tracked ones get an implicit smoke every
    # round; these five run only when the driver window reaches them).
    # (sim_neardup_cosine, sim_topk_ivfpq and mm_payload_stats yielded
    # their slots to pipeline_pretrain_mix, the changed s7, and
    # dedup_simhash_pairs — all three are pytest-pinned, their plan
    # families stay in-window via sim_topk_ivf / mm entries covered
    # by bench, and they re-enter the rotation next round.)
    "events_asof_attribution",
    "events_funnel",
]
_STABLE_TAIL = [
    # Driver-green in CORRECTNESS_r04 (50 queries) or r3, untouched
    # this round, parked past slot 50 so the staleness rotation above
    # fits. Re-confirmations only — parking these loses no first
    # verification. The r4 head (streaming entries, recall audits,
    # snapshot suite, the 17 first-verifications) lives here now.
    "o3_window_suite",
    "m5_snapshot_diff",
    "a2_orders_cube",
    "events_anomaly_zscore",
    "sample_train_split",
    "dedup_containment_pairs",
    "dedup_source_stats",
    "dedup_incremental_minhash",
    "events_bitmap_retention",
    "events_interarrival_stats",
    "events_session_stats",
    "events_dau_rolling",
    "sim_embedding_stats",
    "sim_centroid_outliers",
    "dedup_cross_source",
    "events_daily_gapfill",
    "dedup_minhash_lsh",
    "sim_neardup_lsh",
    "events_stream_attribution",
    "events_stream_sessionize",
    "events_stream_clamp",
    "sim_semantic_dedup",
    "dedup_lsh_recall",
    "sim_recall_audit",
    "events_stream_ingest",
    "m2_validated_append",
    "m4_delete_upsert",
    "s5_snapshot_roundtrip",
    "s8_rollup_maintenance",
    "q_above_customer_avg",
    "text_bigram_lm_score",
    "pipeline_training_mix",
    "text_tfidf_topk",
    "text_pii_scrub",
    "docs_chunk_overlap",
    "docs_domain_budget",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "dedup_contamination",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_incremental",
    "dedup_span_exact",
    "dedup_bloom_prefilter",
    "dedup_graph_stats",
    "docs_strip_dup_spans",
    "pipeline_dedup_corpus",
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
