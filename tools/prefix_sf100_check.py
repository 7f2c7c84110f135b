"""Exactness-tier at-scale correctness row for ``dedup_prefix_jaccard``
(round-8 verdict missing #3): the all-pairs SQL oracle is infeasible at
sf100 (hub shingles make the unguarded inverted-index join df²-sized),
so the check decomposes into the two halves that ARE feasible:

1. SOUNDNESS (every returned row, not a sample): recompute each
   returned pair's exact Jaccard from the oracle-side shingle sets
   (DuckDB runs the exact ``_DOC_SHINGLES_SQL`` relational pass the
   driver oracle uses; numpy/python does the set arithmetic) and
   require bit-identical (common, n_a, n_b, jaccard) per pair and
   j >= threshold.
2. COMPLETENESS (sampled, exact per sampled doc): for N sampled docs,
   enumerate their TRUE partner sets by probing the full inverted
   index (all docs sharing >= 1 shingle with the sample — bounded:
   sample-shingles × df), verify exactly, and require every true
   >= tau pair touching the sample to appear in the Spark result.
3. CROSS-FAMILY INVARIANT: the LSH tier's verified pair set (numpy
   band replay — the sf100 battery's oracle) must be a SUBSET of the
   exact pair set at the same threshold; reports the LSH front's
   measured recall at this tier.

Usage: SPARK_GRAFT_DRIVER_MEM=40g python tools/prefix_sf100_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")
N_SAMPLE = 2_000
PASSES = 16


def main() -> int:
    import duckdb
    import numpy as np

    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )
    from flat_file_social_media_database_engine_spark.workloads import (
        dedup as D,
    )

    spark = build_session("prefixcheck")
    t0 = time.time()
    got = {
        (int(r["doc_id_a"]), int(r["doc_id_b"])): (
            int(r["common"]), int(r["n_a"]), int(r["n_b"]),
            float(r["jaccard"]),
        )
        for r in D.dedup_prefix_jaccard_bounded(
            spark, SF100, passes=PASSES
        ).collect()
    }
    spark_wall = round(time.time() - t0, 1)
    print(f"spark bounded prefix join: {len(got)} pairs [{spark_wall}s]",
          flush=True)

    # oracle-side shingle sets: the EXACT relational pass the driver
    # oracle executes, zero Spark involvement
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF100}/documents.parquet')"
    )
    t0 = time.time()
    t = con.sql(
        f"{D._DOC_SHINGLES_SQL} SELECT doc_id, h FROM e ORDER BY doc_id"
    ).arrow()
    doc = t["doc_id"].to_numpy().astype(np.int64, copy=False)
    h = t["h"].to_numpy().astype(np.int64, copy=False)
    del t
    docs_u, starts = np.unique(doc, return_index=True)
    ends = np.append(starts[1:], len(doc))
    pos = {int(d): i for i, d in enumerate(docs_u)}
    print(f"oracle shingle pass: {len(doc)} rows, {len(docs_u)} docs "
          f"[{time.time()-t0:.1f}s]", flush=True)

    def sset(d: int) -> set:
        i = pos[d]
        return set(int(x) for x in h[starts[i]:ends[i]])

    tau_n, tau_d = D.PREFIX_TAU_NUM, D.PREFIX_TAU_DEN

    # --- 1. soundness over EVERY returned pair ----------------------
    t0 = time.time()
    bad = 0
    for (a, b), (common, na, nb, j) in got.items():
        sa, sb = sset(a), sset(b)
        c = len(sa & sb)
        ok = (
            c == common and len(sa) == na and len(sb) == nb
            and tau_d * c >= tau_n * (na + nb - c)
            and abs(j - c / (na + nb - c)) < 1e-12
        )
        if not ok:
            bad += 1
            if bad <= 5:
                print(f"SOUNDNESS FAIL {(a, b)}: got {got[(a, b)]} want "
                      f"c={c} n_a={len(sa)} n_b={len(sb)}")
    print(f"soundness: {len(got) - bad}/{len(got)} exact "
          f"[{time.time()-t0:.1f}s]", flush=True)

    # --- 2. sampled completeness ------------------------------------
    # inverted index: argsort h once, then per sampled doc gather all
    # docs sharing any of its shingles (hub shingles bounded by the
    # sample size, not the corpus)
    t0 = time.time()
    order = np.argsort(h, kind="stable")
    hs = h[order]
    ds = doc[order]
    rng = np.random.default_rng(9)  # pinned seed: reproducible row
    sample = [int(d) for d in rng.choice(docs_u, N_SAMPLE, replace=False)]
    missing = 0
    true_pairs = 0
    for d in sample:
        sd = sset(d)
        cands: set = set()
        for x in sd:
            lo = np.searchsorted(hs, x, side="left")
            hi = np.searchsorted(hs, x, side="right")
            cands.update(int(c) for c in ds[lo:hi])
        cands.discard(d)
        for c in cands:
            sc = sset(c)
            inter = len(sd & sc)
            if tau_d * inter >= tau_n * (len(sd) + len(sc) - inter):
                true_pairs += 1
                key = (min(d, c), max(d, c))
                if key not in got:
                    missing += 1
                    if missing <= 5:
                        print(f"COMPLETENESS FAIL: true pair {key} "
                              f"absent from result")
    print(f"completeness: {true_pairs - missing}/{true_pairs} true "
          f"pairs of {N_SAMPLE} sampled docs present "
          f"[{time.time()-t0:.1f}s]", flush=True)

    # --- 3. LSH-tier subset + recall --------------------------------
    t0 = time.time()
    from tools.selfcheck import _lsh_pairs_replay

    lsh = _lsh_pairs_replay(con)
    lsh_pairs = {
        (int(a), int(b))
        for a, b in zip(lsh["doc_id_a"], lsh["doc_id_b"])
    }
    not_subset = len(lsh_pairs - set(got))
    recall = (len(lsh_pairs) - not_subset) / max(len(got), 1)
    print(f"lsh subset: {len(lsh_pairs)} lsh pairs, {not_subset} outside "
          f"exact set; lsh recall vs exact = {recall:.6f} "
          f"[{time.time()-t0:.1f}s]", flush=True)

    out = {
        "pairs": len(got),
        "spark_wall": spark_wall,
        "soundness_bad": bad,
        "sampled_docs": N_SAMPLE,
        "sampled_true_pairs": true_pairs,
        "completeness_missing": missing,
        "lsh_pairs": len(lsh_pairs),
        "lsh_outside_exact": not_subset,
        "lsh_recall_vs_exact": round(recall, 6),
    }
    print("PREFIXCHECK_JSON " + json.dumps(out))
    return 1 if (bad or missing or not_subset) else 0


if __name__ == "__main__":
    raise SystemExit(main())
