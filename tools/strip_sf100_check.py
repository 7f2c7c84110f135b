"""Span-family at-scale correctness row for ``docs_strip_dup_spans``
(the one battery row whose FULL SQL oracle is infeasible on this box:
the rebuild string-aggregates 5M cleaned texts over a 1B-row position
unnest, which DuckDB cannot spill — measured OOM at both 24GB and
60GB caps while the Spark side completed). The check keeps everything
that must be corpus-wide corpus-wide and samples only the rebuild:

1. The gram pass, corpus-wide counts, and the canonical-occurrence
   window (``_SPAN_CTES`` + ``_SPAN_REMOVAL_CTES``'s ``nc`` — the
   rule under test) run over the WHOLE corpus in DuckDB, verbatim
   from the module's published CTE strings.
2. The per-doc rebuild (position unnest → removal join → ordered
   re-join) runs for N_SAMPLE pinned-RNG-sampled docs, and those
   rows must be BIT-IDENTICAL (doc_id, n_tokens, n_removed,
   cleaned_text) to the Spark result's same rows.
3. Full-corpus invariants ride along: row count and total token
   count compare against the DuckDB tok pass for every doc, and
   total removed positions against ``rem``'s corpus-wide distinct
   count (each a scalar, no giant transfer).

Usage: SPARK_GRAFT_DRIVER_MEM=30g python tools/strip_sf100_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")
N_SAMPLE = 20_000


def main() -> int:
    import duckdb
    import numpy as np
    import pandas as pd

    from flat_file_social_media_database_engine_spark.session import (
        build_session,
    )
    from flat_file_social_media_database_engine_spark.workloads import (
        dedup as D,
    )
    from tools.selfcheck import dtype_drift, value_hash

    con = duckdb.connect()
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "48GB")
        + "'"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF100}/documents.parquet')"
    )
    ids = con.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    rng = np.random.default_rng(9)  # pinned seed: reproducible row
    sample = np.sort(rng.choice(ids, min(N_SAMPLE, len(ids)), replace=False))
    con.register("sids", pd.DataFrame({"doc_id": sample.astype("int64")}))

    # --- Spark side: full corpus run, sampled rows collected --------
    spark = build_session("stripcheck")
    t0 = time.time()
    full = D.docs_strip_dup_spans(spark, SF100)
    from pyspark.sql import functions as F

    agg = full.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_removed").alias("rem"),
    ).collect()[0]
    sdf = (
        full.join(
            F.broadcast(
                spark.createDataFrame(
                    [(int(x),) for x in sample], "doc_id bigint"
                )
            ),
            "doc_id",
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    spark_wall = round(time.time() - t0, 1)
    print(
        f"spark: {agg['n']} rows, {agg['tok']} tokens, {agg['rem']} "
        f"removed; {len(sdf)} sampled rows [{spark_wall}s]",
        flush=True,
    )

    # --- oracle side: corpus-wide rule, sample-sized rebuild --------
    t0 = time.time()
    osql = f"""
    WITH {D._SPAN_CTES},
    {D._SPAN_REMOVAL_CTES},
    rem_s AS (
      SELECT DISTINCT nc.doc_id, unnest(range(nc.pos, nc.pos + {D.SPAN_K}))
             AS p
      FROM nc JOIN sids ON sids.doc_id = nc.doc_id
    ),
    tp AS (
      SELECT t.doc_id, unnest(range(1, len(t.toks) + 1)) AS p, t.toks
      FROM tok t JOIN sids ON sids.doc_id = t.doc_id
    ),
    kept AS (
      SELECT tp.doc_id, tp.p, tp.toks[tp.p] AS tk
      FROM tp LEFT JOIN rem_s ON rem_s.doc_id = tp.doc_id
                             AND rem_s.p = tp.p
      WHERE rem_s.p IS NULL
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(list(tk ORDER BY p), ' ') AS cleaned_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) AS BIGINT) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(a.cleaned_text, '') AS cleaned_text
    FROM tok t JOIN sids ON sids.doc_id = t.doc_id
    LEFT JOIN agg a ON a.doc_id = t.doc_id
    ORDER BY t.doc_id
    """
    odf = con.sql(osql).df().reset_index(drop=True)
    oracle_wall = round(time.time() - t0, 1)
    print(f"oracle sampled rebuild: {len(odf)} rows [{oracle_wall}s]",
          flush=True)

    ok_rows = (
        len(sdf) == len(odf)
        and not dtype_drift(sdf, odf)
        and value_hash(sdf) == value_hash(odf)
    )
    if not ok_rows and len(sdf) == len(odf):
        sn = sdf.sort_values("doc_id").reset_index(drop=True)
        on = odf.sort_values("doc_id").reset_index(drop=True)
        diff = (sn != on).any(axis=1)
        print("first diffs:")
        print(sn[diff].head(3))
        print(on[diff].head(3))

    # --- full-corpus invariants -------------------------------------
    t0 = time.time()
    tok_tot = con.sql(
        "WITH tok AS (SELECT doc_id, "
        + D._TOKENS_SQL
        + " AS toks FROM documents) "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(len(toks)) AS BIGINT) AS tok FROM tok"
    ).fetchone()
    rem_tot = None
    try:
        rem_tot = con.sql(
            f"WITH {D._SPAN_CTES}, {D._SPAN_REMOVAL_CTES} "
            "SELECT CAST(count(*) AS BIGINT) FROM rem"
        ).fetchone()[0]
    except Exception as ex:  # the corpus-wide distinct may exceed RAM
        print(f"rem total skipped: {ex}")
    inv_wall = round(time.time() - t0, 1)
    ok_inv = int(agg["n"]) == int(tok_tot[0]) and int(agg["tok"]) == int(
        tok_tot[1]
    )
    ok_rem = rem_tot is None or int(agg["rem"]) == int(rem_tot)
    out = {
        "sampled_rows": len(sdf),
        "rows_hash_identical": bool(ok_rows),
        "corpus_rows": int(agg["n"]),
        "corpus_tokens": int(agg["tok"]),
        "corpus_removed": int(agg["rem"]),
        "invariants_ok": bool(ok_inv and ok_rem),
        "rem_total_oracle": None if rem_tot is None else int(rem_tot),
        "spark_wall_s": spark_wall,
        "oracle_wall_s": oracle_wall,
        "invariant_wall_s": inv_wall,
    }
    print("STRIPCHECK_JSON " + json.dumps(out))
    spark.stop()
    return 0 if ok_rows and ok_inv and ok_rem else 1


if __name__ == "__main__":
    raise SystemExit(main())
