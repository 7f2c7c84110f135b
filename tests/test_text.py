"""Text-analysis tier unit checks (sf0.001). Differential vs DuckDB
runs via tools/selfcheck.py; these pin the operator semantics on
hand-computable inputs.
"""

from __future__ import annotations

import pytest

from flat_file_social_media_database_engine_spark.workloads import text as T


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the cat sat on the mat", "en", "s", 22),
        (2, "  spaced   out\ttokens ", "en", "s", 22),
        (3, "uno dos tres", "es", "s", 12),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _metrics(spark, docs_df, tmp_path):
    path = str(tmp_path / "documents.parquet")
    docs_df.write.mode("overwrite").parquet(path)
    return {
        r["doc_id"]: r.asDict()
        for r in T.text_quality_score(spark, str(tmp_path)).collect()
    }


def test_quality_metrics_hand_checked(spark, docs_df, tmp_path):
    m = _metrics(spark, docs_df, tmp_path)
    d1 = m[1]  # "the cat sat on the mat": 6 tokens, 5 uniq, stops {the,the,on}
    assert d1["n_tokens"] == 6
    assert d1["n_uniq"] if "n_uniq" in d1 else True
    assert d1["uniq_ratio"] == pytest.approx(5 / 6)
    assert d1["stop_ratio"] == pytest.approx(3 / 6)
    assert d1["mean_tok_len"] == pytest.approx((3 + 3 + 3 + 2 + 3 + 3) / 6)
    # whitespace-run tokenization: doc 2 has exactly 3 tokens
    assert m[2]["n_tokens"] == 3


def test_fingerprint_deterministic_and_content_addressed(spark, docs_df, tmp_path):
    path = str(tmp_path / "documents.parquet")
    docs_df.write.mode("overwrite").parquet(path)
    fp1 = {r["doc_id"]: r["fingerprint"] for r in T.text_fingerprint(spark, str(tmp_path)).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in T.text_fingerprint(spark, str(tmp_path)).collect()}
    assert fp1 == fp2  # stable across runs
    assert len(set(fp1.values())) == 3  # distinct docs → distinct fingerprints


def test_langid_prefers_marker_majority(spark, tmp_path):
    rows = [
        (1, "the cat and the dog is here", "x", "s", 1),
        (2, "el que la es de", "x", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["pred_lang"] for r in T.text_langid(spark, str(tmp_path)).collect()}
    assert out[1] == "en"
    assert out[2] == "es"


def test_bigram_lm_score_hand_checked(spark, tmp_path):
    """Corpus: unigram tf a=3 b=3 c=1 x=1; bigram tf 'a b'=3,
    'b a'=1, 'b c'=1. Cohesion is sum(btf)/sum(prefix tf) — one
    division of exact integer sums. Single-token docs drop out."""
    rows = [
        (1, "a b a b", "en", "s", 7),
        (2, "a b c", "en", "s", 5),
        (3, "x", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in T.text_bigram_lm_score(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2}  # doc 3 has no bigrams
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_bigram_tf"] == 3 + 1 + 3
    assert out[1]["sum_prefix_tf"] == 3 + 3 + 3
    assert out[1]["bigram_cohesion"] == 7 / 9
    assert out[2]["n_bigrams"] == 2
    assert out[2]["sum_bigram_tf"] == 3 + 1
    assert out[2]["sum_prefix_tf"] == 3 + 3
    assert out[2]["bigram_cohesion"] == 4 / 6


def test_bigram_arrow_fold_matches_join_form(spark, tmp_path):
    """Round-10: the Arrow fold (flat token stream + segment cumsums)
    must be bit-identical to the pre-round-10 explode + broadcast-join
    + groupBy formulation, rebuilt here as the executable spec. The
    corpus is adversarial for the flat-stream form: doc 1 ends with
    'b' and doc 2 starts with 'c' while 'b c' IS a real corpus bigram
    (doc 3), so a leaked doc-BOUNDARY position would inflate doc 1's
    sums instead of failing loudly; 0- and 1-token docs pin the empty
    segments."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a b", "en", "s", 3),
        (2, "c d", "en", "s", 3),
        (3, "b c a b c d", "en", "s", 11),
        (4, "", "en", "s", 0),
        (5, "a", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    docs_arr = spark.read.parquet(str(tmp_path / "documents.parquet")).select(
        "doc_id", T._tokens().alias("toks")
    )
    tok = docs_arr.select("doc_id", F.explode("toks").alias("token"))
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    big = docs_arr.select("doc_id", F.explode(F.expr(T._BIGRAMS_EXPR)).alias("bg"))
    bgf = big.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("btf"))
    spec = (
        big.join(F.broadcast(bgf), "bg")
        .join(F.broadcast(uni), F.split(F.col("bg"), " ")[0] == F.col("token"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("btf").cast("bigint").alias("sum_bigram_tf"),
            F.sum("tf").cast("bigint").alias("sum_prefix_tf"),
        )
        .withColumn(
            "bigram_cohesion",
            F.col("sum_bigram_tf") / F.col("sum_prefix_tf"),
        )
    )
    want = sorted(map(tuple, spec.collect()))
    got = sorted(map(tuple, T.text_bigram_lm_score(spark, sf).collect()))
    assert got == want
    assert len(got) == 3  # docs 4 (empty) and 5 (one token) drop out


def test_tfidf_topk_hand_checked(spark, tmp_path):
    """3 docs; terms (join, hash, filter). doc1 has join×2; doc2 has
    hash×1 + filter×1; doc3 has none of the terms (filtered out).
    idf = N/df (log-free): df_join=1, df_hash=1, df_filter=1, N=3."""
    rows = [
        (1, "join the join now", "en", "s", 1),
        (2, "hash then filter", "en", "s", 1),
        (3, "nothing relevant", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in T.text_tfidf_topk(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}  # doc3 matches no term
    assert out[1]["score"] == pytest.approx(2 * (3 / 1))
    assert out[2]["score"] == pytest.approx(1 * (3 / 1) + 1 * (3 / 1))


def test_pii_scrub_counts_and_redacts(spark, tmp_path):
    """doc 0: %7==0 and %11==0 → planted email AND phone; doc 1:
    neither. A doc whose original text contains an email is also caught."""
    rows = [
        (0, "base text", "en", "s", 1),
        (1, "reach me at alice@corp.io today", "en", "s", 1),
        (2, "clean", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in T.text_pii_scrub(spark, str(tmp_path)).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1  # planted both
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0  # organic email
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    # redaction is idempotent: same doc content + same planting → same digest
    again = {r["doc_id"]: r for r in T.text_pii_scrub(spark, str(tmp_path)).collect()}
    assert {k: v["redacted_md5"] for k, v in out.items()} == {
        k: v["redacted_md5"] for k, v in again.items()
    }


def test_chunk_overlap_grid_and_truncation(spark, tmp_path):
    """40 tokens, window=16 stride=12 → starts 0,12,24,36 with chunk
    lengths 16,16,16,4 (final truncates); 10 tokens → one chunk of 10."""
    long_doc = " ".join(f"t{i}" for i in range(40))
    short_doc = " ".join(f"s{i}" for i in range(10))
    rows = [(1, long_doc, "en", "s", 1), (2, short_doc, "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = T.docs_chunk_overlap(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 12, 24, 36]
    assert [r["n_chunk_tokens"] for r in c1] == [16, 16, 16, 4]
    assert [r["chunk_id"] for r in c1] == [0, 1, 2, 3]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 10
    # overlap invariant: consecutive windows share window-stride tokens,
    # so every token index is covered at least once
    covered = set()
    for r in c1:
        covered |= set(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(40))


def test_domain_budget_cap_and_length_preference(spark, tmp_path):
    """docs_domain_budget: each source contributes min(cap, n_source)
    docs, survivors are the longest per source, ranks are 1..kept."""
    rows = []
    # source s0: 3 docs (under cap) — all survive
    for i in range(3):
        rows.append((i, "w " * (i + 1), "en", "src0", 2 * (i + 1)))
    # source s1: DOMAIN_CAP + 5 docs with distinct lengths — only the
    # longest DOMAIN_CAP survive
    from flat_file_social_media_database_engine_spark.workloads.text import (
        DOMAIN_CAP,
    )

    n1 = DOMAIN_CAP + 5
    for i in range(n1):
        rows.append((100 + i, "w " * (i + 1), "en", "src1", 2 * (i + 1)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from flat_file_social_media_database_engine_spark.workloads.text import (
        docs_domain_budget,
    )

    out = docs_domain_budget(spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["src0"]) == 3
    assert len(by_src["src1"]) == DOMAIN_CAP
    # survivors of src1 are exactly the longest DOMAIN_CAP docs
    kept_ids = {r["doc_id"] for r in by_src["src1"]}
    assert kept_ids == {100 + i for i in range(n1 - DOMAIN_CAP, n1)}
    for src, got in by_src.items():
        assert sorted(r["rnk"] for r in got) == list(range(1, len(got) + 1))
        # rank follows length descending
        by_rank = sorted(got, key=lambda r: r["rnk"])
        lens = [r["n_chars"] for r in by_rank]
        assert lens == sorted(lens, reverse=True)
