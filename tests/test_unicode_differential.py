"""Unicode differential: the driver fixture's documents are ASCII, so
cross-engine agreement on MULTI-BYTE text was unpinned — yet at 100 TB
of web text, non-ASCII is the common case, and the text/dedup family
leans on exactly the primitives where engines can disagree on it:
character counting (code points vs UTF-16 units vs graphemes),
Levenshtein over non-Latin scripts, md5 over UTF-8 bytes, regex
tokenization of scripts without ASCII word boundaries, and string
rebuild ordering.

This suite plants a corpus of accented Latin, Cyrillic, Greek, CJK,
mixed-script and combining-character documents (including exact and
near duplicates) and runs each documents-only query against its
DuckDB oracle with the driver's own row/schema/dtype/value-hash
compare — the same harness as the tail differential, on adversarial
text instead of fixture text.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import dtype_drift, value_hash

# Queries that read ONLY the documents table (fit the planted corpus).
DOC_QUERIES = [
    "dedup_exact",
    "dedup_source_stats",
    "text_quality_score",
    "text_token_freq",
    "text_fingerprint",
    "text_bpe_token_count",
    "text_repetition_ratio",
    "dedup_span_exact",
    "docs_strip_dup_spans",
    "dedup_edit_distance",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    # r5: lang-keyed sqrt-temperature sampler — the lang column here
    # is the planted corpus's script tags, a real multilingual mix
    "sample_temperature_mix",
    # r5: banded Hamming near-dup — the planted exact-dup pair must
    # collide at distance 0 whatever the script
    "dedup_simhash_pairs",
]

_DOCS = [
    # exact duplicate pair, accented Latin
    (1, "Crème brûlée à la café — déjà vu naïve façade. " * 4, "fr", "web_a"),
    (2, "Crème brûlée à la café — déjà vu naïve façade. " * 4, "fr", "web_b"),
    # near-duplicate (one-word edit) of the pair above
    (3, "Crème brûlée à la café — déjà vu naïve félicité. " * 4, "fr", "web_a"),
    # Cyrillic with a repeated span
    (4, "Быстрая бурая лиса прыгает через ленивую собаку снова и снова "
        "Быстрая бурая лиса прыгает через ленивую собаку", "ru", "web_a"),
    # Greek
    (5, "Η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί "
        "και τρέχει μακριά στο δάσος κάθε πρωί", "el", "web_b"),
    # CJK (no ASCII word boundaries)
    (6, "敏捷的棕色狐狸跳过了懒惰的狗 然后又跳了一次 敏捷的棕色狐狸跳过了懒惰的狗", "zh", "web_c"),
    # mixed script + digits
    (7, "User вопрос: how many 字 are in π ≈ 3.14159 and e ≈ 2.71828 "
        "User вопрос: how many 字 are in π", "mix", "web_c"),
    # combining characters (e + U+0301 vs precomposed é in doc 1)
    (8, "Créme brûlée à la café tres bien "
        "encore une fois s'il vous plait", "fr", "web_b"),
    # long repeated unicode span for coverage math
    (9, ("αβγδε ζηθικ λμνξο πρστυ φχψω " * 6) + "τέλος", "el", "web_a"),
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_docs")
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def unicode_oracle(unicode_dir):
    con = duckdb.connect()
    # Spark writes documents.parquet as a DIRECTORY of part files
    p = os.path.join(unicode_dir, "documents.parquet", "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_unicode_corpus_matches_oracle(spark, unicode_dir, unicode_oracle, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, unicode_dir).toPandas()
    odf = unicode_oracle.sql(oracles[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not (drift := dtype_drift(sdf, odf)), drift
    assert value_hash(sdf) == value_hash(odf), "value hash mismatch"


def test_unicode_exact_dedup_sees_the_duplicate_pair(spark, unicode_dir):
    """Sanity on the planted facts (not just engine agreement): docs
    1/2 are byte-identical → one digest group of size 2; the
    combining-character variant (doc 8) must NOT collapse into it —
    NFC normalization is deliberately out of scope and that choice
    should be visible, not accidental."""
    from pyspark.sql import functions as F
    from flat_file_social_media_database_engine_spark.workloads.dedup import _norm
    from flat_file_social_media_database_engine_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, unicode_dir, "documents")
    groups = (
        docs.select("doc_id", F.md5(_norm()).alias("d"))
        .groupBy("d")
        .agg(F.collect_set("doc_id").alias("ids"))
        .collect()
    )
    by_size = sorted((sorted(r["ids"]) for r in groups), key=len, reverse=True)
    assert by_size[0] == [1, 2]
    assert all(len(g) == 1 for g in by_size[1:])
