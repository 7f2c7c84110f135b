"""Text-analysis tier over the ``documents`` table — the operators a
large-scale training-data pipeline runs before dedup/filtering:
quality scoring, token statistics, language-ID (marker-token
heuristic), and rolling-hash document fingerprinting.

Everything is built-in `pyspark.sql.functions` (split / transform /
aggregate / filter run inside whole-stage codegen on the JVM — no
Python in the hot path), so at 100 TB each operator is a single
column-pruned parquet scan with a narrow projection; the only shuffle
anywhere in this module is `text_token_freq`'s group-by, which
map-side combines to one row per distinct token per partition.

Float determinism (driver value-hash): quality metrics use only
+,-,*,/ and least/greatest over identical integer inputs — IEEE
doubles from the same ops in the same order are bit-equal across
Spark and DuckDB. No transcendental functions (libm results differ).
Counts are cast to BIGINT on both sides (Spark `size()` is int,
DuckDB `len()` is bigint, and DuckDB sums promote to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table
from . import query

# Function-word markers per language — the classic cheap language-ID
# heuristic (count marker-token hits, argmax). On the synthetic
# fixture the vocab is shared across langs, so scoring is uniform —
# the operator's contract (deterministic argmax with name tie-break)
# is what the oracle checks.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS: tuple[str, ...] = ("a", "the", "of", "and", "in", "to", "is", "on")

_FP_MOD = 1_000_000_007  # keep the rolling-hash accumulator < 2^31 so
_FP_MULT = 31  # acc*31 + x never overflows int64


def _tokens(col: str = "text") -> Column:
    """Whitespace tokenization (the BPE-ish regex split: any run of
    whitespace is one separator; leading/trailing trimmed first).

    NULL text ≡ empty string, tier-wide: the Arrow shingle pass
    already mapped None→"" (``_shingles_udf``), but the JVM
    expression propagated NULL — and DuckDB's ``list_prepend(seed,
    NULL)`` folds NULL lists to the seed while Spark's ``aggregate``
    returns NULL, so null text silently diverged cross-engine
    (caught by tests/test_null_robustness.py). Coalescing at the one
    tokenizer both engines share makes every downstream text query
    treat null text exactly like empty text; non-null rows are
    bit-unchanged."""
    return F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")


_TOKENS_SQL = "regexp_split_to_array(trim(coalesce(text, '')), '\\s+')"


def _sql_in(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _in_set(words: tuple[str, ...]):
    """Unary lambda factory for F.filter membership tests."""
    return lambda t: t.isin(*words)


# ---------------------------------------------------------------------------
# Quality scoring: per-doc token stats + a composite quality score.
# ---------------------------------------------------------------------------
@query(
    "text_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
                 AS sum_tok_len,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             CAST(len(list_filter(toks, t -> t IN ({_sql_in(STOPWORDS)})))
                  AS BIGINT) AS n_stop,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
                 AS n_alpha
      FROM tok
    )
    SELECT doc_id, n_tokens, n_chars,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE sum_tok_len / n_tokens END AS mean_tok_len,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE n_uniq / n_tokens END AS uniq_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE n_stop / n_tokens END AS stop_ratio,
           CASE WHEN n_chars = 0 THEN 0.0
                ELSE n_alpha / n_chars END AS alpha_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE least(1.0, n_tokens / 64.0)
                     * (0.5 + 0.5 * (n_uniq / n_tokens)) END AS quality
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (length / stopword / uniqueness
    ratios) and a composite score — the filter signal of a pretraining
    pipeline. One scan, no shuffle, codegen throughout."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    zero = F.lit(0).cast("bigint")
    m = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.aggregate(toks, zero, lambda a, t: a + F.length(t)).alias("sum_tok_len"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
        .cast("bigint")
        .alias("n_alpha"),
    )
    n_tok = F.col("n_tokens")
    guard = lambda expr: F.when(n_tok == 0, F.lit(0.0)).otherwise(expr)  # noqa: E731
    return m.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        guard(F.col("sum_tok_len") / n_tok).alias("mean_tok_len"),
        guard(F.col("n_uniq") / n_tok).alias("uniq_ratio"),
        guard(F.col("n_stop") / n_tok).alias("stop_ratio"),
        F.when(F.col("n_chars") == 0, F.lit(0.0))
        .otherwise(F.col("n_alpha") / F.col("n_chars"))
        .alias("alpha_ratio"),
        guard(
            F.least(F.lit(1.0), n_tok / F.lit(64.0))
            * (F.lit(0.5) + F.lit(0.5) * (F.col("n_uniq") / n_tok))
        ).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Corpus token frequency: top-k tokens. The only shuffle in the tier;
# partial (map-side) aggregation reduces it to |vocab| rows/partition.
# ---------------------------------------------------------------------------
@query(
    "text_token_freq",
    oracle=f"""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Language-ID: marker-token hit counts + deterministic argmax.
# ---------------------------------------------------------------------------
def _langid_case_sql() -> str:
    """CASE argmax over hit counts; ties break by language-name order
    (the CASE chain tests >= in sorted-lang order)."""
    langs = sorted(LANG_MARKERS)
    conds = []
    for lang in langs:
        others = [f"hits_{lang} >= hits_{o}" for o in langs if o != lang]
        conds.append(f"WHEN {' AND '.join(others)} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


@query(
    "text_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents
    ),
    h AS (
      SELECT doc_id, lang AS label_lang,
             {", ".join(
                 f"CAST(len(list_filter(toks, t -> t IN ({_sql_in(ms)})))"
                 f" AS BIGINT) AS hits_{lang}"
                 for lang, ms in sorted(LANG_MARKERS.items())
             )}
      FROM tok
    )
    SELECT doc_id, label_lang, {_langid_case_sql()} AS pred_lang,
           greatest({", ".join("hits_" + lang for lang in sorted(LANG_MARKERS))})
               AS best_hits
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-token language-ID heuristic. Pure projection —
    scales as a map-only pass; the marker sets ship in the plan
    (literal arrays), no join, no shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    langs = sorted(LANG_MARKERS)
    h = docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        # NB: the lambda must be unary — PySpark treats a 2-arg lambda
        # as (element, index), so a `ms=ms` default would capture the
        # index column instead of the marker tuple.
        *[
            F.size(F.filter(toks, _in_set(ms))).cast("bigint").alias(f"hits_{lang}")
            for lang, ms in sorted(LANG_MARKERS.items())
        ],
    )
    # CASE chain in sorted-lang order: ties go to the earliest
    # language name, matching the oracle's CASE chain.
    pred_chain = None
    for lang in langs:
        others = [
            F.col(f"hits_{lang}") >= F.col(f"hits_{o}") for o in langs if o != lang
        ]
        cond = others[0]
        for c in others[1:]:
            cond = cond & c
        pred_chain = (
            F.when(cond, F.lit(lang))
            if pred_chain is None
            else pred_chain.when(cond, F.lit(lang))
        )
    return h.select(
        "doc_id",
        "label_lang",
        pred_chain.otherwise(F.lit("und")).alias("pred_lang"),
        F.greatest(*[F.col(f"hits_{lang}") for lang in langs]).alias("best_hits"),
    )


# ---------------------------------------------------------------------------
# Document fingerprint: polynomial rolling hash over the token stream
# (per-token code = ascii(first char) + 17*len), mod 1e9+7. Exactly
# reproducible in SQL on any engine — the content-addressing primitive
# exact dedup builds on when raw text is too wide to group on.
# ---------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST(list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform({_TOKENS_SQL},
                      t -> CAST(ascii(t) + 17 * length(t) AS BIGINT))),
                  (a, x) -> (a * {_FP_MULT} + x) % {_FP_MOD}
                ) AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    codes = F.transform(
        _tokens(), lambda t: (F.ascii(t) + 17 * F.length(t)).cast("bigint")
    )
    # DuckDB list_reduce seeds with the first element, so the oracle
    # prepends the 0 seed; Spark aggregate takes it explicitly.
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda a, x: (a * _FP_MULT + x) % _FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Composed pipeline: the actual shape of a training-data cleaning job
# — quality-filter then exact-dedup the survivors (keep-first). One
# scan feeds both stages; the only shuffle is the dedup group-by.
# ---------------------------------------------------------------------------
_CLEAN_MIN_TOKENS = 20
_CLEAN_MIN_UNIQ = 0.30


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, text, {_TOKENS_SQL} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id, lang, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
      FROM tok
    ),
    kept AS (
      SELECT doc_id, lang, text, n_tokens
      FROM m
      WHERE n_tokens >= {_CLEAN_MIN_TOKENS}
        AND n_uniq / n_tokens >= {_CLEAN_MIN_UNIQ}
    )
    SELECT min(doc_id) AS keep_doc_id,
           count(*) AS group_size,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens
    FROM kept
    GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter + exact-dedup in one plan: documents below the
    token/uniqueness floor drop map-side (the filter rides the scan),
    survivors group on normalized text with keep-first. At 100 TB the
    filter typically removes 30-60% of raw crawl BEFORE the dedup
    shuffle — ordering the stages this way is the point."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    m = docs.select(
        "doc_id",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
    )
    kept = m.filter(
        (F.col("n_tokens") >= _CLEAN_MIN_TOKENS)
        & (F.col("n_uniq") / F.col("n_tokens") >= _CLEAN_MIN_UNIQ)
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        kept.groupBy(norm.alias("__norm"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("__norm")
        .select("keep_doc_id", "group_size", "n_tokens")
    )


# ---------------------------------------------------------------------------
# BPE-ish subword tokenization: alpha runs / digit runs / single
# non-alphanumeric marks (the GPT-2 pre-tokenizer shape, minus byte
# fallback) — the token-count signal LLM data budgets are priced in.
# ---------------------------------------------------------------------------
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "text_bpe_token_count",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_BPE_RE}') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_bpe,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
               AS n_covered_chars
    FROM t
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc subword-ish token counts via one regexp_extract_all —
    map-only, codegen, and the regex is anchored per-match so the
    scan cost is linear in characters."""
    docs = read_table(spark, sf_dir, "documents")
    # idx=0 = whole match (Spark defaults to capture group 1)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)
    zero = F.lit(0).cast("bigint")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq_bpe"),
        F.aggregate(toks, zero, lambda a, x: a + F.length(x)).alias(
            "n_covered_chars"
        ),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style quality signal): fraction of
# repeated 3-gram slots within each doc = 1 - distinct/total shingles.
# ---------------------------------------------------------------------------
@query(
    "text_repetition_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_shingle_slots,
             CAST(CASE WHEN len(toks) >= 3
                  THEN len(list_distinct(list_transform(
                         range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' '))))
                  ELSE 0 END AS BIGINT) AS n_distinct
      FROM tok
    )
    SELECT doc_id, n_shingle_slots, n_distinct,
           CASE WHEN n_shingle_slots = 0 THEN 0.0
                ELSE (n_shingle_slots - n_distinct) / n_shingle_slots
           END AS repetition_ratio
    FROM m
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-shingle fraction per doc — the classic boilerplate /
    looping-text filter signal. Map-only."""
    from .dedup import SHINGLE_K, _shingles  # 3-gram shingles, shared defn

    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    slots = F.greatest(F.size(toks) - (SHINGLE_K - 1), F.lit(0)).cast("bigint")
    m = docs.select(
        "doc_id",
        slots.alias("n_shingle_slots"),
        F.size(_shingles(toks)).cast("bigint").alias("n_distinct"),
    )
    return m.select(
        "doc_id",
        "n_shingle_slots",
        "n_distinct",
        F.when(F.col("n_shingle_slots") == 0, F.lit(0.0))
        .otherwise(
            (F.col("n_shingle_slots") - F.col("n_distinct"))
            / F.col("n_shingle_slots")
        )
        .alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# Per-source corpus stats — the mixture-weighting signal (how much
# data each source contributes and at what quality).
# ---------------------------------------------------------------------------
@query(
    "text_source_stats",
    oracle="""
    WITH tok AS (
      SELECT source, lang,
             CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS BIGINT)
                 AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM tok
    GROUP BY source
    """,
)
def text_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            F.size(_tokens()).cast("bigint").alias("n_tokens"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — the mixture-weighting sampler.
# Each source gets a target keep-rate; a doc survives iff its 60-bit
# md5 hash falls below rate * 2^60. Map-only, reproducible, and
# stable under reruns/backfills (the property a 100 TB mixture build
# needs: adding new files never changes which OLD docs survive, which
# coin-flip `df.sample` cannot promise across partitionings).
# ---------------------------------------------------------------------------
_SAMPLE_SALT = "mix-v1"
_H60_MAX = float(1 << 60)
# keep-rate by source index mod 4: a stand-in mixture schedule
# (e.g. keep all curated data, downsample crawl tiers).
_SAMPLE_RATES = (1.0, 0.5, 0.25, 0.125)


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN {r}" for i, r in enumerate(_SAMPLE_RATES)
    )
    return (
        f"CASE CAST(substr(source, 4) AS BIGINT) % {len(_SAMPLE_RATES)} "
        f"{whens} END"
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             CAST({_rate_case_sql()} AS DOUBLE) AS keep_rate,
             CAST(('0x' || substr(md5('{_SAMPLE_SALT}-' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM documents
    )
    SELECT doc_id, source, keep_rate
    FROM rated
    WHERE h < keep_rate * {_H60_MAX}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold sampling at per-source rates. The hash is salted
    so independent samplers over the same corpus decorrelate."""
    docs = read_table(spark, sf_dir, "documents")
    src_idx = F.substring("source", 4, 10).cast("bigint") % len(_SAMPLE_RATES)
    rate = F.lit(None).cast("double")
    for i, r in reversed(list(enumerate(_SAMPLE_RATES))):
        rate = F.when(src_idx == i, F.lit(r)).otherwise(rate)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_SAMPLE_SALT + "-"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select("doc_id", "source", rate.alias("keep_rate"), h.alias("h"))
        .filter(F.col("h") < F.col("keep_rate") * F.lit(_H60_MAX))
        .select("doc_id", "source", "keep_rate")
    )


# ---------------------------------------------------------------------------
# Temperature-flattened source mixing — the multilingual-sampling
# rebalance (kept docs per source ∝ n_src^α, α < 1 flattens the
# head; the exponentiated-count schedule of the XLM-R / mBERT data
# mixers). α = 0.5 deliberately: sqrt is the one fractional power
# that is IEEE-exact in both engines (pow/exp/ln are libm calls whose
# low bits differ — see module docstring), so the keep-rate doubles
# hash-match cross-engine with no rounding escape hatch. The rate is
# anchored at the SMALLEST language (keep_rate = sqrt(n_min /
# n_lang), ≤ 1 everywhere) so flattening is pure downsampling — no
# replication. The stratum is ``lang``, the canonical multilingual
# axis and the one with real skew in the fixture (en ≈ 40%, others
# ≈ 15% each — the ``source`` strata are exactly uniform, which
# would make the rate 1.0 everywhere and the operator a no-op).
# Same deterministic md5-threshold gate as sample_stratified: map-only,
# rerun/backfill-stable, decorrelated from other samplers by salt.
# Scale: one map-side-combined count on |langs| keys, two broadcast
# joins (per-lang counts + the one-row minimum), then a map-only
# filter riding the scan — no data-sized shuffle at any size.
# ---------------------------------------------------------------------------
_TEMP_SALT = "temp-v1"


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
      FROM documents GROUP BY lang
    ),
    mn AS (SELECT CAST(min(n_lang) AS DOUBLE) AS n_min FROM counts),
    rated AS (
      SELECT d.doc_id, d.lang,
             sqrt(n_min / CAST(n_lang AS DOUBLE)) AS keep_rate,
             CAST(('0x' || substr(md5('{_TEMP_SALT}-' || CAST(d.doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM documents d JOIN counts USING (lang) CROSS JOIN mn
    )
    SELECT doc_id, lang, keep_rate
    FROM rated
    WHERE h < keep_rate * {_H60_MAX}
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature sampling: survivors per language ∝
    sqrt(n_lang), anchored so the smallest language keeps everything."""
    from ..plans.materialize import materialize

    docs = read_table(spark, sf_dir, "documents")
    # |langs| rows, materialized: both consumers (the rate join and
    # the one-row min) otherwise re-run the counting scan — one fewer
    # full pass over the lang column at corpus scale.
    counts = materialize(
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    )
    mn = counts.agg(F.min("n_lang").cast("double").alias("n_min"))
    rated = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(mn))
    )
    keep_rate = F.sqrt(F.col("n_min") / F.col("n_lang").cast("double"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_TEMP_SALT + "-"), F.col("doc_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        rated.select(
            "doc_id", "lang", keep_rate.alias("keep_rate"), h.alias("h")
        )
        .filter(F.col("h") < F.col("keep_rate") * F.lit(_H60_MAX))
        .select("doc_id", "lang", "keep_rate")
    )


# ---------------------------------------------------------------------------
# Sequence packing — assign each doc its slice of the concatenated
# per-source token stream (docs concatenated in doc_id order, split
# into SEQ_LEN-token training sequences). The chunk a doc STARTS in
# is floor(start_offset / SEQ_LEN); the packer downstream only needs
# (chunk_id, offset) to materialize sequences without re-reading
# neighbors. The prefix sum is SHARDED (operators/rankselect.py's
# offsets decomposition): range-partition on (source, doc_id),
# per-(partition, source) token sums, metadata-sized exclusive prefix
# offsets, broadcast back — with a handful of sources, a
# `partitionBy("source")` window would make one dominant source one
# unsplittable sort task at 100 TB; here every window partition is a
# range slice sized by the partitioner.
# ---------------------------------------------------------------------------
SEQ_LEN = 256  # tokens per packed training sequence


@query(
    "docs_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    run AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens AS BIGINT) AS start_offset
      FROM tok
    )
    SELECT doc_id, source, n_tokens, start_offset,
           CAST(floor(start_offset / {SEQ_LEN}) AS BIGINT) AS chunk_id
    FROM run
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc start offset in the per-source concatenated token
    stream, via the sharded exclusive prefix sum (see banner comment;
    reference lineage: O2's total-order iteration contract,
    buzzdb_lab1.cpp:92-94, applied to a running measure). Pinned
    hash-identical to the monolithic `partitionBy("source")` window
    formulation in tests/test_rankselect.py."""
    from ..operators.rankselect import grouped_prefix_sum

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.size(_tokens()).cast("bigint").alias("n_tokens")
    )
    run = grouped_prefix_sum(
        tok,
        group_cols=["source"],
        order_by=[F.col("doc_id").asc()],
        value_col="n_tokens",
        out_col="start_offset",
    ).withColumn("start_offset", F.col("start_offset").cast("bigint"))
    return run.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / SEQ_LEN).cast("bigint").alias("chunk_id"),
    )


# ---------------------------------------------------------------------------
# Corpus-statistics scoring: per-doc mean corpus-frequency of its
# tokens — the cheap stand-in for LM-perplexity filtering (rare-token
# soup scores low, common fluent text scores high). The shape that
# matters: a corpus-wide dictionary build, then a broadcast join of
# that dictionary against the exploded token stream. No logs — IEEE
# division of exact integer sums keeps the oracle bit-exact.
# ---------------------------------------------------------------------------
@query(
    "text_commonness_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
    ),
    freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(f.tf) AS BIGINT) AS sum_tf,
           sum(f.tf) / count(*) AS mean_token_freq
    FROM tok t JOIN freq f ON f.token = t.token
    GROUP BY t.doc_id
    """,
)
def text_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two passes over one exploded token stream: build the corpus
    frequency dictionary (map-side-combined group-by), then score
    each doc by joining the dictionary back. The exploded stream is
    materialized spill-safe (persist(DISK_ONLY) + count barrier, see
    ``plans.materialize`` — lineage kept, unlike executor-local
    localCheckpoint) so both passes read it without re-tokenizing —
    and the dictionary side broadcasts (vocabulary grows ~log of
    corpus size; at 100 TB it is still executor-memory sized, and if
    it ever is not, the join key is already the shuffle key)."""
    from ..plans.materialize import materialize

    docs = read_table(spark, sf_dir, "documents")
    tok = materialize(
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    return (
        tok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_tf",
            (F.col("sum_tf") / F.col("n_tokens")).alias("mean_token_freq"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: the holdout-assignment op every
# training-data build runs LAST. Assignment is a salted 60-bit md5 of
# the doc_id taken mod 100 (98/1/1), so it is (a) independent of the
# sampling ops' salts, (b) rerun- and backfill-stable — a doc keeps
# its split forever, new docs land without reshuffling old ones —
# and (c) map-only per doc. The report aggregates per (source,
# split): at 100 TB the split column is written with the shard and
# the report is this same one-shuffle group-by.
# ---------------------------------------------------------------------------
_SPLIT_SALT = "split-v1"  # decorrelated from mix-v1 / trainmix-v1


@query(
    "sample_train_split",
    oracle=f"""
    WITH assigned AS (
      SELECT source, n_chars,
             CAST(('0x' || substr(md5('{_SPLIT_SALT}-' ||
                                      CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 98 THEN 'train'
                WHEN bucket = 98 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM assigned
    GROUP BY 1, 2
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(_SPLIT_SALT + "-"), F.col("doc_id").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    bucket = h % 100
    split = (
        F.when(bucket < 98, F.lit("train"))
        .when(bucket == 98, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM cohesion score: the 2-gram upgrade of the commonness
# score's unigram LM proxy. Per doc: how often its ADJACENT token
# pairs co-occur corpus-wide, relative to how often their prefix
# token appears at all — sum(tf(w1,w2)) / sum(tf(w1)) over the doc's
# bigrams. Shuffled/concatenated word soup scores low (pairs are
# rare even when tokens are common); text copied from fluent sources
# scores high. All sums are exact BIGINTs and the score is ONE double
# division at the end, so the oracle hash-matches bit-for-bit (the
# per-pair-ratio formulation would sum doubles in engine-dependent
# order).
#
# Bigrams materialize as 'w1 w2' strings (tokens are whitespace-split,
# so the space separator is unambiguous); the empty-array guard keeps
# slice() lengths non-negative for 0/1-token docs.
# ---------------------------------------------------------------------------
_BIGRAMS_EXPR = (
    "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), "
    "slice(toks, 2, greatest(size(toks)-1, 0)), "
    "(a, b) -> concat(a, ' ', b))"
)
# DuckDB range(a, b) is end-exclusive and lists are 1-indexed:
# range(1, greatest(len,1)) is empty for 0/1-token docs, else 1..n-1.
_BIGRAMS_SQL = (
    "list_transform(range(1, greatest(len(toks), 1)), "
    "i -> toks[i] || ' ' || toks[i+1])"
)

_TOKEN_ARRAYS_CACHE: dict = {}
_BIGRAM_DICTS_CACHE: dict = {}


def _token_arrays_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks): the tokenized corpus, materialized once per
    (application, sf_dir) — round-10: ``text_bigram_lm_score``
    previously re-persisted this pass on EVERY call (a per-call
    persist of the same deterministic lineage, never unpersisted);
    session-caching it is the same policy as ``_shingle_arrays``."""
    from ..plans.materialize import materialize, session_cached

    def build():
        docs = read_table(spark, sf_dir, "documents")
        return materialize(docs.select("doc_id", _tokens().alias("toks")))

    return session_cached(_TOKEN_ARRAYS_CACHE, spark, sf_dir, build)


def _bigram_dicts_shared(spark: SparkSession, sf_dir: str):
    """Broadcast of ({token: tf}, {bigram: btf}) — the corpus unigram
    and bigram dictionaries as plain Python dicts, computed once per
    (application, sf_dir) off the shared token pass.

    These are corpus STATISTICS (dictionary-sized, sub-linear in
    corpus bytes), the same artifact class as the shingle document
    frequencies inside the dedup tier's prefix pass or the LSH
    extension-bit count — and the pre-round-10 join form already
    collected both through the driver implicitly via ``F.broadcast``.
    Every declared result still computes per action from the token
    arrays + these statistics."""
    from ..plans.materialize import session_cached

    def build():
        arr = _token_arrays_shared(spark, sf_dir)
        tok = arr.select(F.explode("toks").alias("token"))
        uni = tok.groupBy("token").agg(
            F.count(F.lit(1)).cast("bigint").alias("tf")
        )
        bgf = (
            arr.select(F.explode(F.expr(_BIGRAMS_EXPR)).alias("bg"))
            .groupBy("bg")
            .agg(F.count(F.lit(1)).cast("bigint").alias("btf"))
        )
        u_pdf = uni.toPandas()
        b_pdf = bgf.toPandas()
        return spark.sparkContext.broadcast(
            (dict(zip(u_pdf.token, u_pdf.tf)), dict(zip(b_pdf.bg, b_pdf.btf)))
        )

    return session_cached(_BIGRAM_DICTS_CACHE, spark, sf_dir, build)


@query(
    "text_bigram_lm_score",
    oracle=f"""
    WITH arr AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS token FROM arr
    ),
    uni AS (
      SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token
    ),
    big AS (
      SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bg FROM arr
    ),
    bgf AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS btf FROM big GROUP BY bg
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(f.btf) AS BIGINT) AS sum_bigram_tf,
           CAST(sum(u.tf) AS BIGINT) AS sum_prefix_tf,
           sum(f.btf) / sum(u.tf) AS bigram_cohesion
    FROM big b
    JOIN bgf f ON f.bg = b.bg
    JOIN uni u ON u.token = split_part(b.bg, ' ', 1)
    GROUP BY b.doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram cohesion vs the corpus bigram/unigram tables.

    One tokenized pass is materialized spill-safe (``plans.
    materialize``) and feeds the two dictionary aggregations (map-side
    combined, dictionary-sized outputs: vocab and bigram-vocab grow
    sub-linearly in corpus size). Round-10 (guide §4.2, verdict item
    5): the per-doc side previously RE-EXPLODED the corpus into a
    bigram stream and ran it through two broadcast joins plus a
    corpus-sized groupBy — but both join sides were already broadcast
    (i.e. collected through the driver and shipped whole), so the
    per-doc sums fold into ONE Arrow pass over the token arrays with
    the same dictionaries as plain Python broadcasts: exact int64
    sums via per-segment cumsum differences, no explode, no join, no
    final shuffle (each doc is one row before and after). Measured
    1.12 -> 0.62 s warm at sf0.1, plan explode+joins+agg -> single
    ArrowEvalPython projection; bit-identical output pinned by test
    and the unchanged oracle. If the bigram table ever outgrows
    driver/executor memory the pre-round-10 join form applies
    unchanged (its join key is already the natural shuffle key).
    Docs with <2 tokens have no bigrams and drop out (the old
    inner-join semantics, now an explicit n_bigrams > 0 filter,
    mirrored by the oracle)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    arr = _token_arrays_shared(spark, sf_dir)
    bc = _bigram_dicts_shared(spark, sf_dir)

    @pandas_udf(
        "struct<n_bigrams:bigint,sum_bigram_tf:bigint,sum_prefix_tf:bigint>"
    )
    def fold(batch):
        import numpy as np

        u, b = bc.value
        lens = np.fromiter(
            (len(x) for x in batch), dtype=np.int64, count=len(batch)
        )
        n_bi = np.maximum(lens - 1, 0)
        flat = [t for x in batch for t in x]
        w1 = pd.Series(flat[:-1] if len(flat) > 1 else [], dtype=object)
        w2 = pd.Series(flat[1:] if len(flat) > 1 else [], dtype=object)
        bg = w1 + " " + w2
        # exact int64 per position; only the doc-BOUNDARY positions
        # (last token of one doc paired with the next doc's first) can
        # miss the dicts — they are never inside any doc's summed
        # segment below, so fillna(0) is inert padding, not semantics
        btf = bg.map(b).fillna(0).astype("int64").to_numpy()
        ptf = w1.map(u).fillna(0).astype("int64").to_numpy()
        ends = np.cumsum(lens)
        starts = np.concatenate(([0], ends[:-1]))
        # doc d's bigram positions are [start_d, end_d - 1) in the
        # flat stream; segment sums as cumsum differences (reduceat
        # mishandles empty segments)
        cb = np.concatenate(([0], np.cumsum(btf)))
        cp = np.concatenate(([0], np.cumsum(ptf)))
        seg_end = np.maximum(ends - 1, starts)
        return pd.DataFrame(
            {
                "n_bigrams": n_bi,
                "sum_bigram_tf": cb[seg_end] - cb[starts],
                "sum_prefix_tf": cp[seg_end] - cp[starts],
            }
        )

    # Guide §4.4: the filter below references the UDF's output, and
    # the optimizer pushes it BENEATH the projection by duplicating
    # the UDF — two ArrowEvalPython nodes, every row folded twice
    # (observed in the committed plan dump). asNondeterministic
    # forbids the duplication: one ArrowEvalPython, filter above it.
    fold = fold.asNondeterministic()
    return (
        arr.select("doc_id", fold("toks").alias("s"))
        .select(
            "doc_id",
            F.col("s.n_bigrams").alias("n_bigrams"),
            F.col("s.sum_bigram_tf").alias("sum_bigram_tf"),
            F.col("s.sum_prefix_tf").alias("sum_prefix_tf"),
        )
        .filter(F.col("n_bigrams") > 0)
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bigram_tf",
            "sum_prefix_tf",
            (F.col("sum_bigram_tf") / F.col("sum_prefix_tf")).alias(
                "bigram_cohesion"
            ),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end training-mix build: the four pipeline stages a real
# 100 TB data build chains — quality filter, exact dedup (keep-first),
# deterministic per-source downsampling, and sequence budgeting —
# composed into ONE plan and reported per source. This is the
# flagship shape of the LLM-data tier: each stage's scale posture is
# inherited from its standalone query (filter rides the scan, dedup
# shuffles digests not bodies, sampling is a map-side hash threshold,
# the report is one row per source).
# ---------------------------------------------------------------------------
_MIX_SALT = "trainmix-v1"  # decorrelated from sample_stratified's salt


@query(
    "pipeline_training_mix",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source, text,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS n_uniq
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source, text, n_tokens
      FROM m
      WHERE n_tokens >= {_CLEAN_MIN_TOKENS}
        AND n_uniq / n_tokens >= {_CLEAN_MIN_UNIQ}
    ),
    survivors AS (
      SELECT min(doc_id) AS doc_id,
             arg_min(source, doc_id) AS source,
             min(n_tokens) AS n_tokens
      FROM kept
      GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    ),
    sampled AS (
      SELECT doc_id, source, n_tokens,
             CAST({_rate_case_sql()} AS DOUBLE) AS keep_rate
      FROM survivors
      WHERE CAST(('0x' || substr(md5('{_MIX_SALT}-' || CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) < CAST({_rate_case_sql()} AS DOUBLE) * {_H60_MAX}
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN} AS BIGINT)
               AS n_sequences,
           min(keep_rate) AS keep_rate
    FROM sampled
    GROUP BY source
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup (keep-first survivor carries its
    source) → salted-hash downsample at per-source mixture rates →
    per-source token totals and SEQ_LEN-sequence budget, in one plan.

    Stage ordering is the scale decision: the filter drops 30-60% of
    raw crawl BEFORE the dedup shuffle, dedup halves again before the
    (map-only) sampler, and only one report row per source ever
    reaches the final agg. Stages reuse the standalone operators'
    exact semantics (same digesting, same hash-threshold family), so
    the composed oracle is the composed SQL of the pieces.
    ``n_sequences`` is integer ceil-division — exact on both engines;
    the survivor's attributes come from ``min_by``/``arg_min`` on the
    group's minimum doc_id (first-wins, deterministic)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    m = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
    )
    kept = m.filter(
        (F.col("n_tokens") >= _CLEAN_MIN_TOKENS)
        & (F.col("n_uniq") / F.col("n_tokens") >= _CLEAN_MIN_UNIQ)
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    survivors = kept.groupBy(norm.alias("__norm")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    src_idx = F.substring("source", 4, 10).cast("bigint") % len(_SAMPLE_RATES)
    rate = F.lit(None).cast("double")
    for i, r in reversed(list(enumerate(_SAMPLE_RATES))):
        rate = F.when(src_idx == i, F.lit(r)).otherwise(rate)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_MIX_SALT + "-"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sampled = survivors.withColumn("keep_rate", rate).filter(
        h < F.col("keep_rate") * F.lit(_H60_MAX)
    )
    total = F.sum("n_tokens")
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("bigint").alias("total_tokens"),
        F.floor((total + SEQ_LEN - 1) / SEQ_LEN).cast("bigint").alias("n_sequences"),
        F.min("keep_rate").alias("keep_rate"),
    )


# ---------------------------------------------------------------------------
# Pretraining-mix capstone: quality filter → exact dedup → sqrt-
# temperature LANGUAGE rebalance → sequence budget, one plan, report
# per language. The composition detail that matters: the temperature
# rates are computed over the SURVIVOR language distribution (after
# filter + dedup), not the raw corpus — dedup removes more of the
# over-represented head than of the tail, so raw-count rates would
# over-downsample the head twice. Scale posture inherited per stage:
# filter rides the scan, dedup shuffles normalized-text digests, the
# survivor language census is a map-side-combined |langs|-key agg off
# the materialized survivor blocks, the gate is a map-only broadcast-
# join + md5 threshold, and one row per language reaches the report.
# ---------------------------------------------------------------------------
_PRETRAIN_SALT = "pretrain-v1"  # decorrelated from temp-v1 / trainmix-v1


@query(
    "pipeline_pretrain_mix",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang, text,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS n_uniq
      FROM documents
    ),
    kept AS (
      SELECT doc_id, lang, text, n_tokens
      FROM m
      WHERE n_tokens >= {_CLEAN_MIN_TOKENS}
        AND n_uniq / n_tokens >= {_CLEAN_MIN_UNIQ}
    ),
    survivors AS (
      SELECT min(doc_id) AS doc_id,
             arg_min(lang, doc_id) AS lang,
             min(n_tokens) AS n_tokens
      FROM kept
      GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    ),
    counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
      FROM survivors GROUP BY lang
    ),
    mn AS (SELECT CAST(min(n_lang) AS DOUBLE) AS n_min FROM counts),
    sampled AS (
      SELECT s.doc_id, s.lang, s.n_tokens,
             sqrt(n_min / CAST(n_lang AS DOUBLE)) AS keep_rate
      FROM survivors s JOIN counts USING (lang) CROSS JOIN mn
      WHERE CAST(('0x' || substr(md5('{_PRETRAIN_SALT}-' || CAST(s.doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) < sqrt(n_min / CAST(n_lang AS DOUBLE)) * {_H60_MAX}
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN} AS BIGINT)
               AS n_sequences,
           min(keep_rate) AS keep_rate
    FROM sampled
    GROUP BY lang
    """,
)
def pipeline_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality floor → keep-first exact dedup → α=0.5 temperature
    rebalance over the survivor language census → SEQ_LEN sequence
    budget, reported per language. Stage semantics reuse the
    standalone operators' exact rules (same floors, same normalized-
    text grouping, same sqrt rate and md5 gate family), so the
    composed oracle is the composed SQL of the pieces."""
    from ..plans.materialize import materialize

    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    m = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
    )
    kept = m.filter(
        (F.col("n_tokens") >= _CLEAN_MIN_TOKENS)
        & (F.col("n_uniq") / F.col("n_tokens") >= _CLEAN_MIN_UNIQ)
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # materialized: the language census AND the gated stream both
    # consume the survivor set — without the persist the full
    # filter+dedup lineage runs twice.
    survivors = materialize(
        kept.groupBy(norm.alias("__norm"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("__norm")
    )
    counts = materialize(
        survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    )
    mn = counts.agg(F.min("n_lang").cast("double").alias("n_min"))
    rated = survivors.join(F.broadcast(counts), "lang").crossJoin(
        F.broadcast(mn)
    )
    keep_rate = F.sqrt(F.col("n_min") / F.col("n_lang").cast("double"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_PRETRAIN_SALT + "-"), F.col("doc_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sampled = rated.withColumn("keep_rate", keep_rate).filter(
        h < keep_rate * F.lit(_H60_MAX)
    )
    total = F.sum("n_tokens")
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("bigint").alias("total_tokens"),
        F.floor((total + SEQ_LEN - 1) / SEQ_LEN).cast("bigint").alias(
            "n_sequences"
        ),
        F.min("keep_rate").alias("keep_rate"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k retrieval: rank documents against a fixed query-term
# set. The reference has no search operator (every buzzdb_lab1.cpp
# query is a key/equality probe); this is the relevance-scoring shape
# a corpus store owes its users, and the per-term weighting primitive
# quality-classifier features build on.
#
# Float determinism: idf is the RAW ratio N/df (one exact integer
# division per term), NOT log(N/df) — libm log results differ in the
# last ulp across engines, and the ranking is identical under any
# monotone transform of idf. The score is an explicit left-to-right
# 3-term sum of products of identically-derived doubles, so Spark and
# DuckDB produce bit-equal values.
# ---------------------------------------------------------------------------
TFIDF_TERMS: tuple[str, ...] = ("join", "hash", "filter")
_TFIDF_K = 25


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    tf AS (
      SELECT doc_id,
             {", ".join(
                 f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT)"
                 f" AS tf_{i}"
                 for i, t in enumerate(TFIDF_TERMS)
             )}
      FROM tok
    ),
    df AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             {", ".join(
                 f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS df_{i}"
                 for i in range(len(TFIDF_TERMS))
             )}
      FROM tf
    )
    SELECT doc_id,
           {" + ".join(
               f"tf_{i} * (CAST(n_docs AS DOUBLE) / df_{i})"
               for i in range(len(TFIDF_TERMS))
           )} AS score,
           {", ".join(f"tf_{i}" for i in range(len(TFIDF_TERMS)))}
    FROM tf CROSS JOIN df
    WHERE {" + ".join(f"tf_{i}" for i in range(len(TFIDF_TERMS)))} > 0
    ORDER BY score DESC, doc_id
    LIMIT {_TFIDF_K}
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k docs by TF-IDF against ``TFIDF_TERMS``.

    Plan shape at 100 TB: one column-pruned scan computes per-doc term
    frequencies (map-only, codegen); the document-frequency vector is
    a SINGLE global aggregate row (map-side combined to one partial
    per partition) broadcast back via cross join — no per-term
    shuffle, no explode of the token stream. Ranking is a TakeOrdered
    (per-partition top-k then driver merge of k·P rows), never a full
    sort. Ties break on doc_id for determinism.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    tf = docs.select(
        "doc_id",
        *[
            F.size(F.filter(toks, _in_set((t,)))).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(TFIDF_TERMS)
        ],
    )
    df_row = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(TFIDF_TERMS))
        ],
    )
    score = None
    for i in range(len(TFIDF_TERMS)):
        term = F.col(f"tf_{i}") * (
            F.col("n_docs").cast("double") / F.col(f"df_{i}")
        )
        score = term if score is None else score + term
    any_tf = None
    for i in range(len(TFIDF_TERMS)):
        any_tf = (
            F.col(f"tf_{i}")
            if any_tf is None
            else any_tf + F.col(f"tf_{i}")
        )
    return (
        tf.crossJoin(F.broadcast(df_row))
        .filter(any_tf > 0)
        .select(
            "doc_id",
            score.alias("score"),
            *[f"tf_{i}" for i in range(len(TFIDF_TERMS))],
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_TFIDF_K)
    )


# ---------------------------------------------------------------------------
# PII scrub: detect + redact email / phone patterns, report counts and
# the redacted text's digest. The fixture corpus is synthetic and
# PII-free, so PII is PLANTED deterministically from doc_id (both
# engines replay the same planting) — a pass-through that fails to
# redact fails the hash, which is the point of the differential.
# Regexes stay inside the Java-regex ∩ RE2 common subset (character
# classes + bounded repetition; no backrefs, no lookaround) so both
# engines compile identical semantics.
# ---------------------------------------------------------------------------
_PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call +49-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE_RE}'))
                AS BIGINT) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM planted
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with per-doc detection counts.

    Map-only: regex extraction and replacement run inside codegen on
    the JVM; at 100 TB this rides the scan with zero shuffles, and the
    digest column lets a downstream writer verify redaction without
    re-reading bodies. Spark's `regexp_replace` is replace-ALL, which
    DuckDB spells with the 'g' flag — the oracle carries the flag so
    both engines scrub every occurrence.
    """
    docs = read_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call +49-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        # idx=0 = the whole match: Spark defaults idx to capture group
        # 1, DuckDB to group 0, and these patterns have no groups.
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Overlapping-window chunking: split each document's token stream into
# fixed-size windows with stride overlap — the context-window
# preparation step between cleaning and packing in a training build
# (pack_sequences budgets whole docs; this splits docs that exceed
# the window). Window/stride are fixture-scaled (production uses e.g.
# 2048/1536); the start-grid arithmetic is scale-free.
# ---------------------------------------------------------------------------
CHUNK_WINDOW = 16
CHUNK_STRIDE = 12


@query(
    "docs_chunk_overlap",
    oracle=f"""
    WITH arr AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 1,
                                    {CHUNK_STRIDE})) AS chunk_start
      FROM arr
    )
    SELECT doc_id,
           CAST(chunk_start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(list_slice(toks, chunk_start + 1,
                               chunk_start + {CHUNK_WINDOW})) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_start + 1,
                                          chunk_start + {CHUNK_WINDOW}), ' '))
               AS chunk_md5
    FROM starts
    """,
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each doc into overlapping token windows
    (``CHUNK_WINDOW`` wide, every ``CHUNK_STRIDE`` tokens; the final
    window truncates at the document end).

    Map-only: `sequence` builds the start grid, `posexplode`-free
    explode fans out ≤ ceil(n_tokens/stride) rows per doc, and the
    window content hashes ride the same projection — no shuffle, no
    Python. At 100 TB the expansion factor is a constant
    window/stride ≈ 1.33× in tokens, and chunk rows inherit the
    scan's partitioning (downstream packing groups by doc locality
    for free).
    """
    docs = read_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", _tokens().alias("toks"))
    starts = arr.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                (F.size("toks") - 1).cast("bigint"),
                F.lit(CHUNK_STRIDE).cast("bigint"),
            )
        ).alias("chunk_start"),
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_start").cast("int") + 1, CHUNK_WINDOW
    )
    return starts.select(
        "doc_id",
        F.floor(F.col("chunk_start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size(sl).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Per-domain document budget — the Common-Crawl-style cap that stops
# any single domain from dominating the mixture (distinct from
# sample_stratified's RATE-based thinning: a cap bounds the absolute
# contribution of a pathological domain no matter how large it gets).
# Survivors are deterministic: rank within source by n_chars DESC
# (prefer substantive documents), then a salted 60-bit md5 hash (so
# equal-length docs are picked reproducibly but without doc_id bias),
# then doc_id as the total-order tiebreak.
# ---------------------------------------------------------------------------
_BUDGET_SALT = "budget-v1"  # decorrelated from the sampler/split salts
DOMAIN_CAP = 12  # max docs any one source may contribute


@query(
    "docs_domain_budget",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC,
                        CAST(('0x' || substr(md5('{_BUDGET_SALT}-' ||
                              CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        doc_id
             ) AS rnk
      FROM documents
    )
    SELECT doc_id, source, n_chars, rnk
    FROM ranked WHERE rnk <= {DOMAIN_CAP}
    """,
)
def docs_domain_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source at DOMAIN_CAP documents, keeping the longest
    (hash-tiebroken) ones — reference lineage: the per-user GROUP
    BY + membership shapes of buzzdb_lab1.cpp:682-773 generalized to
    the bounded-contribution selection a training mixture needs.

    The scale shape is the window top-k's missing combiner
    (operators/topk.py): an Arrow batch-local top-CAP prune runs
    BEFORE the source-keyed shuffle — exact by the superset argument
    documented there — so the window's exchange carries ~CAP docs per
    source per input split instead of every document, and a hot
    domain stops being a shuffle hot key. The window itself
    (JVM-side, unchanged semantics, same SQL oracle) still decides
    every rank."""
    from ..operators.topk import topk_per_key

    docs = read_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(_BUDGET_SALT + "-"), F.col("doc_id").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return topk_per_key(
        docs.select("doc_id", "source", "n_chars"),
        ["source"],
        [
            (F.col("n_chars"), "n_chars", False),
            (h, "_h", True),
            (F.col("doc_id"), "doc_id", True),
        ],
        DOMAIN_CAP,
    )
