"""Smoke + spot checks of the driver-contract workloads at sf0.001.
Full differential verification against DuckDB runs via
tools/selfcheck.py (the local twin of the driver's CORRECTNESS gate).
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(
        df.columns
    )


def test_every_query_has_callable_and_runs(spark, sf_small):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name


def test_oracle_coverage(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # strong-checked fraction stays high (driver sees which are weak)
    assert len(oracles) >= 0.8 * len(qs)


def test_a3_approx_distinct_scale_variant(spark, sf_small):
    """SURVEY §2 A3 scale note: approx_count_distinct is the 100 TB
    form of the distinct-count operator (no exact-distinct shuffle of
    every key). Pin its error against exact on the fixture."""
    from pyspark.sql import functions as F

    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )

    orders = read_table(spark, sf_small, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"]


def test_oracle_coverage_is_total(spark):
    """Round 3: every registered query has an oracle — the driver
    surface has zero rows-only checks left."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) == set(qs)


def test_dedup_source_stats_invariants(spark, sf_small):
    from flat_file_social_media_database_engine_spark.workloads.dedup import (
        dedup_source_stats,
    )
    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )

    rows = dedup_source_stats(spark, sf_small).collect()
    assert sum(r["n_docs"] for r in rows) == read_table(
        spark, sf_small, "documents"
    ).count()
    for r in rows:
        assert r["n_dup_rows"] == r["n_docs"] - r["n_distinct"] >= 0
        assert r["dup_rate"] == r["n_dup_rows"] / r["n_docs"]


def test_pipeline_training_mix_budget_math(spark, sf_small):
    from flat_file_social_media_database_engine_spark.workloads.text import (
        SEQ_LEN,
        _SAMPLE_RATES,
        pipeline_training_mix,
    )

    rows = pipeline_training_mix(spark, sf_small).collect()
    assert rows, "mix report is empty"
    for r in rows:
        assert r["keep_rate"] in _SAMPLE_RATES
        assert r["n_sequences"] == -(-r["total_tokens"] // SEQ_LEN)  # ceil
        assert r["n_docs"] >= 1 and r["total_tokens"] >= r["n_docs"]


def test_kmeans_assignment_improves_and_is_valid(spark, sf_small):
    """Each vector lands in a legal cell with the minimal distance to
    the FINAL centroids being <= its distance to its round-0 seed
    centroid assignment (Lloyd's never increases the objective)."""
    from flat_file_social_media_database_engine_spark.workloads import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )

    out = S.sim_kmeans_assign(spark, sf_small)
    rows = out.collect()
    n = read_table(spark, sf_small, "embeddings").count()
    assert len(rows) == n
    assert all(0 <= r["cell"] < S.KMEANS_K for r in rows)
    assert all(r["dist2"] >= 0.0 for r in rows)
    final_obj = sum(r["dist2"] for r in rows)

    # round-0 objective: distance to nearest SEED centroid
    emb = read_table(spark, sf_small, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    seeds = base.filter(F.col("vec_id") < S.KMEANS_K).select(
        F.col("vec_id").alias("cid"), "v"
    )
    seed_obj = sum(
        r["d2"] for r in S._km_assign(base, seeds).collect()
    )
    assert final_obj <= seed_obj + 1e-9


def test_next_transition_probabilities_sum_to_one(spark, sf_small):
    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_next_transition,
    )

    rows = events_next_transition(spark, sf_small).collect()
    assert rows, "transition matrix empty"
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for from_type, group in by_from.items():
        total = sum(r["prob"] for r in group)
        assert abs(total - 1.0) < 1e-9, from_type
        assert all(r["n"] >= 1 for r in group)


def test_cms_heavy_hitters_overcounts_only(spark, sf_small):
    """CMS estimates are an upper bound on the exact count — a single
    undercount is an implementation bug, not sketch error."""
    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_heavy_hitters,
    )

    rows = events_heavy_hitters(spark, sf_small).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"] > 0
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_bitmap_retention_invariants(spark, sf_small):
    """Offset 0 is definitionally full retention (the cohort day is
    each user's first active day); every other offset is bounded by
    the cohort size."""
    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_bitmap_retention,
    )

    rows = events_bitmap_retention(spark, sf_small).collect()
    assert len(rows) > 0
    by_cohort = {}
    for r in rows:
        assert 1 <= r["n_retained"] <= r["n_users"]
        assert 0.0 < r["retained_frac"] <= 1.0
        assert r["sum_active_days"] >= r["n_users"]
        by_cohort.setdefault(r["cohort_day"], {})[r["off"]] = r
    for cohort, offs in by_cohort.items():
        assert offs[0]["retained_frac"] == 1.0, cohort


def test_session_stats_consistent_with_sessionize(spark, sf_small):
    """The one-row report must equal a pandas aggregation of the
    sessionize table it claims to summarize."""
    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_session_stats,
        events_sessionize,
    )

    sess = events_sessionize(spark, sf_small).toPandas()
    dur_us = (
        sess["session_end"].astype("int64") - sess["session_start"].astype("int64")
    ) // 1000  # ns -> us
    row = events_session_stats(spark, sf_small).collect()[0]
    assert row["n_sessions"] == len(sess)
    assert row["n_users"] == sess["user_id"].nunique()
    assert row["n_single_event"] == int((sess["n_events"] == 1).sum())
    assert row["max_events"] == int(sess["n_events"].max())
    assert row["avg_events"] == sess["n_events"].sum() / len(sess)
    assert row["max_dur_us"] == int(dur_us.max())
    assert row["avg_dur_us"] == int(dur_us.sum()) / len(sess)


def test_dau_rolling_counts_repeat_users_once(spark, tmp_path_factory):
    """WAU is a distinct count, not a windowed sum of DAU: a user
    active on two days inside the window contributes once."""
    from datetime import datetime

    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_dau_rolling,
    )

    rows = [
        (1, datetime(2024, 3, 1, 10), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 3, 1, 11), 2, "view", 1.0, "{}"),
        (3, datetime(2024, 3, 2, 9), 1, "view", 1.0, "{}"),   # user 1 again
        (4, datetime(2024, 3, 2, 9, 30), 1, "click", 1.0, "{}"),  # same day dup
    ]
    d = tmp_path_factory.mktemp("dau")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    out = {r["day"].day: r for r in events_dau_rolling(spark, str(d)).collect()}
    assert out[1]["dau"] == 2 and out[2]["dau"] == 1
    assert out[1]["wau"] == 2          # partial leading window
    assert out[2]["wau"] == 2          # user 1 counted ONCE, not twice


def test_daily_gapfill_emits_zero_rows_for_silent_days(spark, tmp_path_factory):
    """The driver fixture has events on every day, so the zero-fill
    branch never fires there — plant a 5-day range with two silent
    days and assert they surface as explicit zero rows."""
    from datetime import datetime

    from flat_file_social_media_database_engine_spark.workloads.eventflow import (
        events_daily_gapfill,
    )

    rows = [
        (1, datetime(2024, 3, 1, 10), 1, "view", 2.5, "{}"),
        (2, datetime(2024, 3, 2, 11), 2, "view", 1.0, "{}"),
        # March 3-4 silent
        (3, datetime(2024, 3, 5, 9), 1, "click", 4.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("gapfill")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    out = {r["day"].day: r for r in events_daily_gapfill(spark, str(d)).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]  # dense spine, inclusive bounds
    for silent in (3, 4):
        assert out[silent]["n_events"] == 0
        assert out[silent]["sum_value"] == 0.0
    assert out[1]["n_events"] == 1 and out[1]["sum_value"] == 2.5
    assert out[5]["sum_value"] == 4.0


def test_temperature_mix_rates_and_anchor(spark, sf_small):
    """keep_rate must be exactly sqrt(n_min / n_lang), the smallest
    language keeps every doc (rate 1.0), and realized keeps sit
    within binomial noise of rate * n (the md5 gate is a uniform
    60-bit draw)."""
    import math

    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )
    from flat_file_social_media_database_engine_spark.workloads.text import (
        sample_temperature_mix,
    )

    totals = {
        r["lang"]: r["n"]
        for r in read_table(spark, sf_small, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    n_min = min(totals.values())
    out = sample_temperature_mix(spark, sf_small).collect()
    kept: dict[str, int] = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        assert r["keep_rate"] == math.sqrt(n_min / totals[r["lang"]])
    for lang, n in totals.items():
        rate = math.sqrt(n_min / n)
        if rate == 1.0:
            assert kept.get(lang) == n  # anchor lang: pure pass-through
        else:
            sigma = math.sqrt(n * rate * (1 - rate))
            assert abs(kept.get(lang, 0) - n * rate) <= 5 * sigma + 1, (
                f"{lang}: kept {kept.get(lang, 0)} of {n} at rate {rate}"
            )


def test_market_basket_cap_dedup_and_lift(spark, tmp_path_factory):
    """The basket cap excludes a mega-order entirely, repeated
    (order, part) lines count once, and lift reproduces the textbook
    formula on a hand-checkable fixture."""
    from flat_file_social_media_database_engine_spark.workloads.analytics import (
        _BASKET_CAP,
        orders_market_basket,
    )

    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 2)]  # dup line
    rows += [(3, p) for p in range(100, 100 + _BASKET_CAP + 1)]  # over cap
    d = tmp_path_factory.mktemp("basket")
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))

    out = orders_market_basket(spark, str(d)).collect()
    # only (1,2) co-occurs >= 2 times; the mega-order's parts never
    # appear (cap), order 2's duplicated part 2 counted once
    assert len(out) == 1
    r = out[0]
    assert (r["p1"], r["p2"]) == (1, 2)
    assert r["pair_orders"] == 2 and r["p1_orders"] == 2 and r["p2_orders"] == 2
    # lift = pair * n_baskets / (p1 * p2) = 2*2/(2*2); mega-order is
    # not in n_baskets either
    assert r["lift"] == 1.0


def test_pretrain_mix_rates_from_survivor_census(spark, sf_small):
    """keep_rate must be sqrt(n_min / n_lang) over the SURVIVOR
    distribution (post filter+dedup), not the raw corpus, with the
    smallest surviving language at exactly 1.0; the sequence budget
    is ceil-division of the kept token total."""
    import math

    from flat_file_social_media_database_engine_spark.workloads.text import (
        SEQ_LEN,
        pipeline_pretrain_mix,
    )

    rows = pipeline_pretrain_mix(spark, sf_small).collect()
    assert rows, "pretrain mix report is empty"
    rates = {r["lang"]: r["keep_rate"] for r in rows}
    assert max(rates.values()) == 1.0  # anchor language survives whole
    # invert each rate to its implied census ratio n/n_min and check
    # the anchor inverts to exactly 1.0 (full integrality of n/n_min
    # is not checkable here: the ratios need not be whole numbers,
    # and n_min itself is not observable from the rates alone)
    implied = {
        lang: (1.0 / rate) ** 2 for lang, rate in rates.items() if rate > 0
    }
    n_min_implied = min(implied.values())
    assert math.isclose(n_min_implied, 1.0, rel_tol=1e-9)
    for r in rows:
        assert 0 < r["keep_rate"] <= 1.0
        assert r["n_sequences"] == -(-r["total_tokens"] // SEQ_LEN)
        assert r["n_docs"] >= 1
