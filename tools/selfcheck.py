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

# Past this corpus size the full-SQL MinHash replay is the wall (64
# affine MIN aggregates over the exploded gram table — hours at 5M
# docs); _lsh_pairs_replay below recomputes the identical contract
# with DuckDB doing the relational half and numpy the dense half.
LSH_REPLAY_MIN_DOCS = 10_000

# Keyed by a CONTENT fingerprint of the documents table, not id(con):
# CPython reuses object ids after GC, so a closed-then-reopened
# connection over a DIFFERENT corpus could silently hit a stale entry
# (round-8 advisor). count+sum+min+max of doc_id plus total text bytes
# is cheap (one scan) and changes whenever the corpus does.
_LSH_REPLAY_CACHE: dict[tuple, "pd.DataFrame"] = {}


def _docs_fingerprint(con) -> tuple:
    return tuple(
        con.sql(
            "SELECT count(*), sum(doc_id), min(doc_id), max(doc_id), "
            "sum(length(text)) FROM documents"
        ).fetchone()
    )


def _lsh_pairs_replay(con) -> pd.DataFrame:
    """Engine-independent replay of the ``dedup_minhash_lsh`` contract
    for large corpora (the LSH-pair twin of ``_cc_unionfind``): DuckDB
    executes the EXACT tokenize→shingle→md5 SQL the driver oracle uses
    (``_DOC_SHINGLES_SQL`` — the relational half), then numpy computes
    the 64 affine mins with ``minimum.reduceat`` and the 16×4 banding
    as packed-int bucket keys (the dense-arithmetic half the SQL
    formulation pays 64 aggregates for), Python applies the hot-bucket
    cap and exact set-intersection verification. Zero Spark
    involvement; every constant (affine family, band geometry, cap,
    threshold) imports from the module's published contract. Bucket
    keys only need EQUALITY, so packing four <2^30 mins into two
    int64s groups identically to the oracle's md5-over-varchar keys."""
    import numpy as np

    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        _AB,
        _DOC_SHINGLES_SQL,
        _P,
        BANDS,
        HOT_BUCKET_CAP,
        JACCARD_THRESHOLD,
        ROWS_PER_BAND,
    )

    key = _docs_fingerprint(con)
    if key in _LSH_REPLAY_CACHE:
        return _LSH_REPLAY_CACHE[key]

    t = con.sql(
        f"{_DOC_SHINGLES_SQL} SELECT doc_id, h FROM e ORDER BY doc_id"
    ).arrow()
    doc = t["doc_id"].to_numpy().astype(np.int64, copy=False)
    h = t["h"].to_numpy().astype(np.int64, copy=False)
    # MinHash runs in g-space (h % P), exactly like both engines'
    # signature passes; VERIFICATION must stay in full 60-bit h-space
    # (array_intersect on harr) — two distinct shingle hashes collide
    # mod P with probability ~C(52,2)/P ≈ 1.3e-6 per doc, i.e. a few
    # EXPECTED docs at 5M, which would silently shift common/n.
    g = h % _P
    del t
    docs, starts = np.unique(doc, return_index=True)
    n_sh = np.diff(np.append(starts, len(doc))).astype(np.int64)

    mins = np.empty((len(_AB), len(docs)), dtype=np.int64)
    for i, (a, b) in enumerate(_AB):  # a, g < P ≈ 2^30 → a*g+b < 2^63
        mins[i] = np.minimum.reduceat((a * g + b) % _P, starts)
    # g (8 B × corpus shingles — 2 GB at sf100) is dead past the mins;
    # free it before the band loop so the replay's peak stays bounded
    # next to the co-resident JVM (the r9 battery measured the full
    # process mix OOM-killing the SparkContext without this class of
    # hygiene — SCALING.md battery protocol)
    del g

    # band buckets: count EVERY bucket (cap is on total size), then
    # emit pairs only from buckets of 2..cap members
    pair_set: set[tuple[int, int]] = set()
    for band in range(BANDS):
        m = mins[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
        # pack pairs of <2^30 mins into int64 keys GENERICALLY over
        # ROWS_PER_BAND (round-8 advisor: the 4-row packing was
        # hardcoded); an odd trailing row stands alone. Equality of
        # the packed tuple == equality of the band signature.
        ks = [
            (m[i] << 31) | m[i + 1] if i + 1 < ROWS_PER_BAND else m[i]
            for i in range(0, ROWS_PER_BAND, 2)
        ]
        order = np.lexsort(tuple(reversed(ks)))
        kss = [k[order] for k in ks]
        new_grp = np.empty(len(docs), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = np.logical_or.reduce(
            [k[1:] != k[:-1] for k in kss]
        )
        bounds = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(bounds, len(docs)))
        ds = docs[order]
        for lo, c in zip(bounds[(sizes >= 2) & (sizes <= HOT_BUCKET_CAP)],
                         sizes[(sizes >= 2) & (sizes <= HOT_BUCKET_CAP)]):
            members = sorted(int(x) for x in ds[lo : lo + c])
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pair_set.add((members[i], members[j]))
        del order, kss, ds

    # exact-Jaccard verification on candidate docs' FULL-WIDTH
    # shingle-hash sets, sliced out of the already-loaded table
    cand_docs = sorted({d for p in pair_set for d in p})
    pos = {int(d): i for i, d in enumerate(docs)}
    sets = {}
    for d in cand_docs:
        i = pos[d]
        lo = starts[i]
        hi = lo + n_sh[i]
        sets[d] = set(int(x) for x in h[lo:hi])
    rows = []
    for a, b in sorted(pair_set):
        common = len(sets[a] & sets[b])
        na, nb = len(sets[a]), len(sets[b])
        j = common / (na + nb - common)
        if j >= JACCARD_THRESHOLD:
            rows.append((a, b, common, na, nb, j))
    out = pd.DataFrame(
        rows,
        columns=["doc_id_a", "doc_id_b", "common", "n_a", "n_b", "jaccard"],
    )
    for c in ["doc_id_a", "doc_id_b", "common", "n_a", "n_b"]:
        out[c] = out[c].astype("int64")
    out["jaccard"] = out["jaccard"].astype("float64")
    _LSH_REPLAY_CACHE[key] = out
    return out


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

    # Above the replay threshold, consume the numpy LSH replay — the
    # full-SQL pair CTE is the hours-long wall that kept CC out of the
    # sf100 battery (round-7 verdict item 2); below it, the exact
    # oracle CTE chain the driver executes.
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    if n_docs > LSH_REPLAY_MIN_DOCS:
        pairs = _lsh_pairs_replay(con)
    else:
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


def pair_substituted_oracle(sql: str, con) -> str | None:
    """Rewrite an oracle that embeds the full MinHash-LSH CTE chain to
    read the verified pair set from the numpy band replay instead —
    the generic extension of the minhash/clusters replay twins to
    every DOWNSTREAM pair consumer (pagerank, graph stats, cross-
    source matrix, incremental classification), whose own SQL is
    cheap once ``lsh_pairs`` is a table.

    Sound by construction: the replay is pinned bit-identical to the
    chain it replaces (tests/test_dedup.py replay-identity test), the
    substitution only rewrites the literal ``_lsh_pairs_ctes()``
    prefix, and a bind probe (EXPLAIN against an EMPTY stand-in
    table, so the guard costs nothing) rejects any oracle that
    references chain-INTERNAL CTEs beyond ``lsh_pairs`` (the recall
    audit uses ``e``/``sizes``, edit distance uses ``cand`` — those
    must keep the full SQL chain). Returns the rewritten SQL, or None
    when substitution does not apply."""
    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        _lsh_pairs_ctes,
    )

    chain = _lsh_pairs_ctes()
    if chain not in sql:
        return None
    out = sql.replace(
        chain, "WITH lsh_pairs AS (SELECT * FROM replay_pairs)", 1
    )
    probe = pd.DataFrame(
        {
            "doc_id_a": pd.Series(dtype="int64"),
            "doc_id_b": pd.Series(dtype="int64"),
            "common": pd.Series(dtype="int64"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    con.register("replay_pairs", probe)
    try:
        con.sql("EXPLAIN " + out)
    except Exception:
        return None  # dangling chain-internal reference → full SQL
    con.register("replay_pairs", _lsh_pairs_replay(con))
    return out


def cc_substituted_oracle(sql: str, con) -> str | None:
    """The closure-chain twin of ``pair_substituted_oracle``: rewrite
    an oracle embedding ``_cc_ctes()`` (the RECURSIVE transitive-
    closure chain ending in ``lab`` — the O(E·diameter) wall that
    keeps the canonical-picker oracles out of large batteries) to
    read ``lsh_pairs`` from the numpy band replay and ``lab`` from
    the union-find replay, with the chain's literal ``edges``
    definition kept inline for downstream degree/centrality math
    (keep_central's pagerank recurrence). Same soundness story: both
    replays are pinned bit-identical to the SQL they replace, and the
    empty-stand-in EXPLAIN probe rejects oracles reaching any other
    chain-internal CTE."""
    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        _cc_ctes,
    )

    chain = _cc_ctes()
    if chain not in sql:
        return None
    stub = """
    WITH lsh_pairs AS (SELECT * FROM replay_pairs),
    edges AS MATERIALIZED (
      SELECT doc_id_a AS a, doc_id_b AS b FROM lsh_pairs
      UNION ALL
      SELECT doc_id_b, doc_id_a FROM lsh_pairs
    ),
    lab AS (SELECT doc_id, cluster_id FROM replay_labels)"""
    out = sql.replace(chain, stub, 1)
    empty_pairs = pd.DataFrame(
        {
            "doc_id_a": pd.Series(dtype="int64"),
            "doc_id_b": pd.Series(dtype="int64"),
            "common": pd.Series(dtype="int64"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    empty_labels = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "cluster_id": pd.Series(dtype="int64"),
        }
    )
    con.register("replay_pairs", empty_pairs)
    con.register("replay_labels", empty_labels)
    try:
        con.sql("EXPLAIN " + out)
    except Exception:
        return None
    con.register("replay_pairs", _lsh_pairs_replay(con))
    con.register(
        "replay_labels", _cc_unionfind(con)[["doc_id", "cluster_id"]]
    )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from flat_file_social_media_database_engine_spark.session import build_session

    spark = build_session("selfcheck")
    con = duckdb.connect()
    # Bound the oracle engine: DuckDB's default memory ceiling is a
    # fraction of HOST RAM, which it cannot have when a 40 GB JVM and
    # the numpy replay share the box — unbounded, the sf100 battery's
    # process mix tripped the OOM killer mid-run (it spills fine).
    # 24GB default fits the combined battery next to a 40-48GB JVM;
    # the env knob exists for solo heavy-oracle rows (the span-strip
    # rebuild string-aggregates 5M cleaned texts, which DuckDB cannot
    # spill — it needs the larger share while the JVM runs smaller).
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "24GB")
        + "'"
    )
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
            elif (
                name == "dedup_minhash_lsh"
                and con.sql("SELECT count(*) FROM documents").fetchone()[0]
                > LSH_REPLAY_MIN_DOCS
            ):
                print("  (dedup_minhash_lsh via numpy band replay)")
                odf = _lsh_pairs_replay(con)
            elif (
                con.sql("SELECT count(*) FROM documents").fetchone()[0]
                > LSH_REPLAY_MIN_DOCS
                and (
                    sub := (
                        cc_substituted_oracle(oracles[name], con)
                        or pair_substituted_oracle(oracles[name], con)
                    )
                )
                is not None
            ):
                print(f"  ({name} via replay-substituted oracle)")
                odf = con.sql(sub).df()
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
