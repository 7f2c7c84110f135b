"""Decade-3 audit: same-session sf10 → sf100 wall ratios for the
scaling watch set, the ext-ladder ceiling demonstration at 2M
vectors, and occupancy receipts — the measurement half of SCALING.md
§"Decade 3". Correctness at sf100 runs separately through
tools/selfcheck.py (bounded-output battery).

Same-session min-of-2 walls at BOTH tiers so the ratio is free of
cross-session host noise. Usage:

    SPARK_GRAFT_DRIVER_MEM=40g python tools/decade3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")

# The decade-3 set: every SCALING.md watch entry plus the queries
# whose super-linear term would first appear where memory pressure
# starts (sorts, corpus rewrites, CC, pair expansion, LSH fronts).
SET3 = [
    "q_pricing_summary",
    "o1_multikey_sort",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_span_exact",
    "docs_strip_dup_spans",
    "pipeline_dedup_corpus",
    "orders_market_basket",
    "sample_temperature_mix",
    "pipeline_pretrain_mix",
    "orders_rfm_segments",
    "events_value_percentiles",
    "docs_pack_sequences",
    "pipeline_clean_corpus",
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "dedup_incremental_persisted",
    # round-7 continuation: the exact prefix join (shuffle-floor
    # bound), pagerank + keep-central (pair-graph bound), PCA (scan
    # bound), and the cross-modal full-outer join.
    "dedup_prefix_jaccard",
    "dedup_pagerank",
    "dedup_keep_central",
    "sim_pca_project",
    "sim_modality_coverage",
]


def main() -> int:
    import __spark_entry__ as entry
    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )

    spark = build_session("decade3")
    qs = entry.queries()

    walls: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SF10, "sf10"), (SF100, "sf100")):
        for n in SET3:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            walls.setdefault(n, {})[tag] = round(best, 2)
            print(f"{tag:6s} {n:28s} {best:8.2f}s", flush=True)

    print("\n| query | sf10 s | sf100 s | r(10->100) | cost/row |")
    print("|---|---|---|---|---|")
    for n in SET3:
        a, b = walls[n]["sf10"], walls[n]["sf100"]
        r = b / a if a > 0 else float("inf")
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x | {r / 10:.2f} |")

    # --- fixed-batch probe receipt (round-7 verdict item 4) -------------
    # The registered dedup_incremental_persisted probes a batch that
    # GROWS with the tier (corpus is the fixed doc_id < N_OLD slice),
    # so its wall tracks the batch. This receipt holds the batch
    # CONSTANT (50k docs) against the committed index at both tiers:
    # ~flat walls prove nothing about the index (listing, occupancy,
    # DPP fan-out) grows with the corpus.
    from flat_file_social_media_database_engine_spark.workloads import (
        dedup as D,
    )

    fixed = {}
    for sf_dir, tag in ((SF10, "sf10"), (SF100, "sf100")):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            D.dedup_incremental_persisted(
                spark, sf_dir, batch_hi=D.N_OLD + 50_000
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        fixed[tag] = round(best, 2)
        print(f"fixed-batch probe (50k) {tag}: {best:.2f}s", flush=True)

    # --- ext-ladder ceiling demonstration at 2M vectors -----------------
    from pyspark.sql import functions as F

    from flat_file_social_media_database_engine_spark.workloads import (
        similarity as S,
    )

    n_vec = S.read_table(spark, SF100, "embeddings").count()
    e = S._corpus_ext_bits(spark, SF100)
    keyed = S._keyed_sigs(S._corpus_signatures(spark, SF100), e)
    occ = keyed.groupBy("t", "k").count()
    stats = occ.agg(
        F.avg("count").alias("avg"),
        F.sum(F.when(F.col("count") > 64, 1).otherwise(0)).alias("hot"),
        F.count(F.lit(1)).alias("buckets"),
    ).collect()[0]
    print(
        f"\nceiling: n={n_vec} e={e} avg_occ={stats['avg']:.1f} "
        f"hot_buckets={stats['hot']}/{stats['buckets']}"
    )
    t0 = time.time()
    n_ladder = S.sim_neardup_lsh(spark, SF100).count()
    t_ladder = time.time() - t0
    print(f"ladder front pairs={n_ladder} [{t_ladder:.1f}s]")
    t0 = time.time()
    # the DRIVER-registered pinned entry — demo and verified query are
    # one code path (round-7 verdict item 5); label/JSON carry the
    # module's actual pinned constants so the measurement can never be
    # attributed to a stale configuration (round-8 advisor)
    n_regen = S.sim_neardup_regenerated_pinned(spark, SF100).count()
    t_regen = time.time() - t0
    print(
        f"regenerated(bits={S.REGEN_BITS},cap={S.REGEN_CAP}) "
        f"pairs={n_regen} [{t_regen:.1f}s]"
    )

    print(
        "DECADE3_JSON "
        + json.dumps(
            {
                "walls": walls,
                "fixed_batch_probe": fixed,
                "ceiling": {
                    "n": n_vec,
                    "e": e,
                    "avg_occ": round(float(stats["avg"]), 1),
                    "hot_buckets": int(stats["hot"]),
                    "buckets": int(stats["buckets"]),
                    "ladder_pairs": n_ladder,
                    "ladder_wall": round(t_ladder, 1),
                    "regen_pairs": n_regen,
                    "regen_wall": round(t_regen, 1),
                    "regen_bits": S.REGEN_BITS,
                    "regen_cap": S.REGEN_CAP,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
