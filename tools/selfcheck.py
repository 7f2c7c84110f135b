"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, compare row count + (sorted-column)
schema + order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value. Deliberately does NOT
    coerce dtypes: the driver's hash is dtype-sensitive (round-1
    lesson — DuckDB HUGEINT vs Spark bigint failed the driver while a
    coercing local gate passed), so the local gate must surface dtype
    drift, not paper over it. Only the pandas storage resolution of
    timestamps is unified (ns vs us is a pandas artifact, not an
    engine-visible type)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_drift(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype *kind/width* differs between Spark
    and the oracle (timestamp resolution excluded, see _normalize)."""

    def kinds(df):
        out = {}
        for c in df.columns:
            d = df[c].dtype
            out[c] = "datetime" if pd.api.types.is_datetime64_any_dtype(d) else str(d)
        return out

    sk, ok = kinds(sdf), kinds(odf)
    return [f"{c}: spark={sk[c]} oracle={ok[c]}" for c in sorted(sk) if sk[c] != ok[c]]


def value_hash(df: pd.DataFrame) -> str:
    df = _normalize(df)
    payload = df.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.sha256(payload).hexdigest()


# Past this corpus size, dedup_clusters' recursive-CTE closure replay
# is the battery bottleneck (~20 min solo at 500k docs, SCALING.md);
# the union-find replay below folds the SAME oracle-derived pair set
# in seconds. Below it, the recursive CTE runs as-is — parity with
# the exact oracle text the driver executes at sf0.01.
CC_UNIONFIND_MIN_DOCS = 10_000


def _cc_unionfind(con) -> pd.DataFrame:
    """Engine-independent replay of the ``dedup_clusters`` contract
    for large corpora: the verified pair set still comes from the
    DuckDB oracle CTE chain (``lsh_pairs_oracle_sql`` — zero Spark
    involvement), and the transitive closure is a path-compressed
    union-find with min-label semantics (cluster_id = least doc_id
    reachable, itself if unpaired) — exactly the recursive CTE's
    ``lab`` definition, O(E·α) instead of O(E·diameter)."""
    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        lsh_pairs_oracle_sql,
    )

    pairs = con.sql(lsh_pairs_oracle_sql()).df()
    docs = con.sql("SELECT doc_id FROM documents ORDER BY doc_id").df()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["doc_id_a"].tolist(), pairs["doc_id_b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-label union

    ids = docs["doc_id"].tolist()
    labels = [find(int(i)) for i in ids]
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "cluster_id": pd.Series(labels, dtype="int64"),
        }
    )
    out["is_canonical"] = out["doc_id"] == out["cluster_id"]
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from flat_file_social_media_database_engine_spark.session import build_session

    spark = build_session("selfcheck")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed, passed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failed.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            if (
                name == "dedup_clusters"
                and con.sql("SELECT count(*) FROM documents").fetchone()[0]
                > CC_UNIONFIND_MIN_DOCS
            ):
                print("  (dedup_clusters closure via union-find replay)")
                odf = _cc_unionfind(con)
            else:
                odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failed.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif drift := dtype_drift(sdf, odf):
            problems.append(f"dtype drift: {drift}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            sn, on = _normalize(sdf), _normalize(odf)
            diff = (sn != on) & ~(sn.isna() & on.isna())
            if diff.any().any():
                cols = [c for c in sn.columns if diff[c].any()]
                rows = diff.any(axis=1)
                print(f"  first diffs in {cols}:")
                print(pd.concat(
                    [sn.loc[rows, cols].head(3).add_suffix("_spark"),
                     on.loc[rows, cols].head(3).add_suffix("_oracle")], axis=1))
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            passed.append(name)
            print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(weak)} weak (rows-only), {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
