"""Property-based checks of operator semantics beyond the loader:
M1 batch-delta application vs a pure-Python model, and the LSH
near-dup containment property (LSH output ⊆ exact-Jaccard output,
with guaranteed recall on near-identical pairs).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flat_file_social_media_database_engine_spark.operators.mutations import (
    apply_view_deltas,
)
from flat_file_social_media_database_engine_spark.workloads import dedup as D

_post_ids = st.integers(min_value=1, max_value=6)
_deltas = st.lists(
    st.tuples(_post_ids, st.integers(min_value=-20, max_value=20)),
    min_size=0,
    max_size=12,
)
_views = st.lists(
    st.integers(min_value=0, max_value=30), min_size=6, max_size=6
)


@given(views=_views, deltas=_deltas)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_view_deltas_matches_net_sum_model(spark, views, deltas):
    """Documented batch semantics: views' = max(0, views + net_delta)
    for keyed rows, identity for others."""
    posts = spark.createDataFrame(
        [(i + 1, f"c{i}", f"u{i}", v) for i, v in enumerate(views)],
        "id int, content string, username string, views int",
    )
    if deltas:
        ddf = spark.createDataFrame(deltas, "id int, delta int")
    else:
        ddf = spark.createDataFrame([], "id int, delta int")
    got = {
        r["id"]: r["views"] for r in apply_view_deltas(posts, ddf).collect()
    }
    net: dict[int, int] = {}
    for pid, dv in deltas:
        net[pid] = net.get(pid, 0) + dv
    want = {
        i + 1: (max(0, v + net[i + 1]) if i + 1 in net else v)
        for i, v in enumerate(views)
    }
    assert got == want


_doc_words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=5,
    max_size=30,
)


@given(docs=st.lists(_doc_words, min_size=2, max_size=8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsh_pairs_subset_of_exact_with_nearid_recall(
    spark, tmp_path_factory, docs
):
    """For ANY corpus: (a) MinHash-LSH output is a subset of the exact
    n-gram-Jaccard output (verification re-scores candidates with the
    same threshold), and (b) an appended EXACT duplicate of doc 0 is
    always recovered (identical shingle sets collide in every band)."""
    rows = [(i, " ".join(w), "en", "s", 1) for i, w in enumerate(docs)]
    rows.append((999, " ".join(docs[0]), "en", "s", 1))  # exact dup of 0
    d = tmp_path_factory.mktemp("prop_lsh")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.dedup_ngram_jaccard(spark, str(d)).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.dedup_minhash_lsh(spark, str(d)).collect()
    }
    assert lsh <= exact
    assert (0, 999) in lsh


# ---------------------------------------------------------------------------
# As-of join vs a pure-Python model: random interleavings of clicks
# and purchases (shared timestamps included) must attribute each
# purchase to the max-event_id click at the latest ts <= purchase ts.
# ---------------------------------------------------------------------------
_events_strat = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=20),  # ts (seconds)
        st.sampled_from(["click", "purchase"]),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_events_strat)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_attribution_matches_model(spark, rows, tmp_path_factory):
    import datetime as dt

    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_asof_attribution,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (
            i,
            base + dt.timedelta(seconds=ts),
            uid,
            et,
            0.0,
            "{}",
        )
        for i, (uid, ts, et) in enumerate(rows)
    ]
    d = tmp_path_factory.mktemp("asof")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    got = {
        r["purchase_id"]: (r["attributed_click_id"], r["attributed_click_ts"])
        for r in events_asof_attribution(spark, str(d)).collect()
    }

    # model: per purchase, clicks of same user with ts <= purchase ts;
    # winner = latest ts, then max event_id
    want = {}
    for i, (uid, ts, et) in enumerate(rows):
        if et != "purchase":
            continue
        cands = [
            (cts, j)
            for j, (cuid, cts, cet) in enumerate(rows)
            if cet == "click" and cuid == uid and cts <= ts
        ]
        if cands:
            cts, cid = max(cands)
            want[i] = (cid, base + dt.timedelta(seconds=cts))
        else:
            want[i] = (None, None)
    assert got == want


def test_interval_union_fold_matches_set_model(spark):
    """`_interval_union_count` (the JVM fold replacing the span
    family's explode+distinct coverage count) vs the obvious
    pure-Python set-union model, over hypothesis-generated position
    multisets — duplicates, overlaps, gaps, and singletons included.
    All examples evaluate in ONE Spark job (one row each)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F
    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        _interval_union_count,
    )

    cases: list[tuple[list[int], int]] = []

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=60), max_size=25),
        st.integers(min_value=1, max_value=9),
    )
    def collect(positions, width):
        cases.append((positions, width))

    collect()

    by_width: dict[int, list[list[int]]] = {}
    for positions, width in cases:
        by_width.setdefault(width, []).append(positions)

    for width, plists in by_width.items():
        df = spark.createDataFrame(
            [(i, ps) for i, ps in enumerate(plists)],
            "case_id int, positions array<bigint>",
        )
        got = {
            r["case_id"]: r["cov"]
            for r in df.select(
                "case_id",
                _interval_union_count(F.col("positions"), width).alias("cov"),
            ).collect()
        }
        for i, ps in enumerate(plists):
            want = len({q for p in ps for q in range(p, p + width)})
            assert got[i] == want, (ps, width, got[i], want)
