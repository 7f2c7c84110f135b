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
