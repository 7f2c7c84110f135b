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
    # --- NEW round 8 (first verification): the regenerated-width
    # near-dup front registered with a pinned REGEN_BITS=15 oracle
    # (round-7 verdict item 5). ---
    # --- CHANGED round 8, hash-space shingle refactor: the shared
    # shingle pass materializes 60-bit hash arrays instead of string
    # arrays (the decade-3 super-linear fix), so every query whose
    # oracle composes on the shingle/LSH CTE chain re-verifies under
    # the new formulation; the span family's removal path moved from
    # per-token explode+anti-join to doc-level array reconstruction;
    # the three stateful streaming entries re-verify under the sized
    # state partitioning (stream_state_partitions). events_stream_
    # ingest also changed but is r6-green, has no stateful shuffle,
    # and yielded its slot to the staleness rotation (window holds
    # exactly 50) — it leads the round-9 rotation. ---
    "sim_neardup_regenerated",
    "dedup_ngram_jaccard",
    "dedup_containment_pairs",
    "dedup_prefix_jaccard",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    "dedup_edit_distance",
    "dedup_contamination",
    "dedup_incremental_minhash",
    "dedup_incremental_persisted",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_pagerank",
    "dedup_keep_central",
    "dedup_graph_stats",
    "dedup_cross_source",
    "docs_strip_dup_spans",
    "pipeline_dedup_corpus",
    "events_stream_attribution",
    "events_stream_sessionize",
    "events_stream_clamp",
    # --- STALENESS ROTATION (round-7 verdict item 7): the 29 queries
    # whose last driver-green row is round 5 — freshness policy says
    # nothing staler than 2 rounds. ---
    "a2_orders_per_customer",
    "dedup_exact",
    "dedup_simhash_pairs",
    "events_hourly_rollup",
    "events_value_percentiles",
    "j2_chained_ri_lineitem",
    "m1_apply_price_deltas",
    "o1_multikey_sort",
    "orders_market_basket",
    "orders_rfm_segments",
    "p3_filter_project",
    "p5_point_lookup",
    "p6_p7_trim_strict_cast",
    "pipeline_clean_corpus",
    "pipeline_pretrain_mix",
    "q1_user_events",
    "q_pricing_summary",
    "q_region_revenue",
    "q_top_revenue_orders",
    "sample_temperature_mix",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "text_commonness_score",
    "text_fingerprint",
    "text_langid",
    "text_quality_score",
    "text_repetition_ratio",
    "text_source_stats",
    "text_token_freq",
]
_STABLE_TAIL = [
    # --- r7-green re-confirmations (fresh last round, minus those
    # pulled into the head by the refactor): absorb the overflow past
    # slot 50 and lead the round-9 rotation after events_stream_
    # ingest and the r6-green mid. ---
    "sim_pca_project",
    "sim_modality_coverage",
    "sim_topk_lsh",
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
    "a5_approx_median",
    "a5_median_totalprice",
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
