"""Text analysis for training-data pipelines: tokenization, quality scoring,
language ID, document fingerprinting.

These extend the reference's surface (it has none of this — SURVEY.md §2.7
F11) with the operators a 100 TB text-corpus pipeline needs. Everything is
pure Spark SQL expressions (array higher-order functions, no Python UDFs):
per-row work with zero shuffle — the scan parallelism is the parallelism.

Each operator has a ``*_SQL`` twin rendering the identical computation for
the DuckDB oracle; the two are kept adjacent so they evolve in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.functions import (
    HASH60_SQL,
    hash60,
)

# ---------------------------------------------------------------------------
# Tokenization (whitespace; lowercased) — shared by all text operators
# ---------------------------------------------------------------------------

def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def TOKENS_SQL(expr: str) -> str:
    return f"regexp_split_to_array(trim(lower({expr})), '\\s+')"


STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

#: language -> marker stopwords (heuristic n-gram-free language ID; the
#: point is the distributed argmax shape, not linguistic accuracy)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "los", "de", "que", "una"),
    "fr": ("le", "les", "des", "et", "une"),
}


def _in_list_sql(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (ceil of
    chars/4, the common ~4-chars-per-token heuristic)."""
    toks = tokens("text")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.ceil(F.length("text") / 4).cast("long").alias("est_bpe_tokens"),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({TOKENS_SQL('text')}) AS n_tokens,
       length(text) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def with_quality(documents: DataFrame) -> DataFrame:
    """``documents`` plus the quality columns, computed row-local (no
    projection down to the metric columns — pipelines that need text/lang
    alongside the scores use this form and stay join-free)."""
    d = documents.withColumn("toks", tokens("text"))
    n = F.size("toks")
    distinct_n = F.size(F.array_distinct("toks"))
    stop_hits = F.size(
        F.expr(f"filter(toks, t -> t IN ({_in_list_sql(STOPWORDS)}))")
    )
    sum_len = F.expr("aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x)")
    return (
        d.withColumn("q_n_chars", F.length("text"))
        .withColumn("n_tokens", n)
        .withColumn("uniq_ratio", F.round(distinct_n / n, 4))
        .withColumn("stop_ratio", F.round(stop_hits / n, 4))
        .withColumn("avg_token_len", F.round(sum_len / n, 4))
        # floor, not round: Spark rounds HALF_UP, DuckDB half-even — on an
        # exact .xxxx5 boundary they disagree; floor of the same double is
        # deterministic in both engines.
        .withColumn(
            "quality_score",
            F.floor(
                (
                    0.5 * (distinct_n / n)
                    + 0.3 * (1 - stop_hits / n)
                    + 0.2 * F.least(F.lit(1.0), (sum_len / n) / 8)
                )
                * 10000
            )
            / 10000,
        )
        .drop("toks")
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length/stopword/uniqueness signals + a composite score in [0,1].

    All ratios are exact integer divisions done in double precision and
    rounded identically in both engines.
    """
    return with_quality(documents).select(
        "doc_id",
        F.col("q_n_chars").alias("n_chars"),
        "n_tokens",
        "uniq_ratio",
        "stop_ratio",
        "avg_token_len",
        "quality_score",
    )


QUALITY_SCORE_SQL = f"""
WITH t AS (SELECT *, {TOKENS_SQL('text')} AS toks FROM documents),
m AS (
  SELECT doc_id, length(text) AS n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, t -> t IN ({_in_list_sql(STOPWORDS)}))) AS stop_hits,
         list_sum(list_transform(toks, t -> length(t))) AS sum_len
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       round(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS uniq_ratio,
       round(stop_hits / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       round(sum_len / CAST(n_tokens AS DOUBLE), 4) AS avg_token_len,
       floor((0.5 * (n_distinct / CAST(n_tokens AS DOUBLE))
           + 0.3 * (1 - stop_hits / CAST(n_tokens AS DOUBLE))
           + 0.2 * least(1.0, (sum_len / CAST(n_tokens AS DOUBLE)) / 8)) * 10000)
         / 10000 AS quality_score
FROM m
"""


# ---------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models",
# table A1 quality heuristics — the hard pass/fail twin of the blended
# quality_score above)
# ---------------------------------------------------------------------------

#: Rule thresholds (document-level). Ratio rules are expressed as integer
#: cross-multiplications below, so both engines compare exact integers —
#: no float rounding anywhere in the flag math.
GOPHER_MIN_TOKENS = 30
GOPHER_MIN_AVG_TOKEN_LEN = 4  # sum_len >= 4 * n_tokens
GOPHER_MAX_AVG_TOKEN_LEN = 10  # sum_len <= 10 * n_tokens
GOPHER_MIN_STOP_HITS = 2
GOPHER_MIN_UNIQ_NUM, GOPHER_MIN_UNIQ_DEN = 1, 2  # distinct/total >= 1/2


def _gopher_rules() -> tuple:
    """The four rule predicates over a ``toks`` column (shared by the
    audit-form flags query and the filter-form gate)."""
    n = F.size("toks")
    nd = F.size(F.array_distinct("toks"))
    stop = F.size(
        F.expr(f"filter(toks, t -> t IN ({_in_list_sql(STOPWORDS)}))")
    )
    sum_len = F.expr(
        "aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x)"
    )
    f_words = n >= GOPHER_MIN_TOKENS
    f_avg = (sum_len >= GOPHER_MIN_AVG_TOKEN_LEN * n) & (
        sum_len <= GOPHER_MAX_AVG_TOKEN_LEN * n
    )
    f_stop = stop >= GOPHER_MIN_STOP_HITS
    f_uniq = nd * GOPHER_MIN_UNIQ_DEN >= n * GOPHER_MIN_UNIQ_NUM
    return n, f_words, f_avg, f_stop, f_uniq


def gopher_gate(documents: DataFrame) -> DataFrame:
    """``documents`` restricted to rows passing ALL Gopher rules — the
    filter form (row-local, no join with the flags output needed); used
    by the corpus pipeline's ``--gopher`` pre-gate."""
    d = documents.withColumn("toks", tokens("text"))
    _, f_words, f_avg, f_stop, f_uniq = _gopher_rules()
    return d.filter(f_words & f_avg & f_stop & f_uniq).drop("toks")


def gopher_quality_flags(documents: DataFrame) -> DataFrame:
    """Per-rule boolean flags + the conjunctive keep decision.

    Row-local (zero shuffle): one tokenization per row feeds all four
    rules. Unlike :func:`quality_score` (a blended float for ranking),
    this is the production *filter* form — per-rule flags survive into
    the output so removal reasons are auditable downstream.
    """
    d = documents.withColumn("toks", tokens("text"))
    n, f_words, f_avg, f_stop, f_uniq = _gopher_rules()
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        f_words.cast("int").alias("flag_word_count"),
        f_avg.cast("int").alias("flag_mean_word_len"),
        f_stop.cast("int").alias("flag_stopwords"),
        f_uniq.cast("int").alias("flag_unique_ratio"),
        (f_words & f_avg & f_stop & f_uniq).cast("int").alias("keep"),
    )


GOPHER_FLAGS_SQL = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL('text')} AS toks FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n,
         len(list_distinct(toks)) AS nd,
         len(list_filter(toks, t -> t IN ({_in_list_sql(STOPWORDS)}))) AS stop,
         list_sum(list_transform(toks, t -> length(t))) AS sum_len
  FROM t
)
SELECT doc_id, n AS n_tokens,
       CAST(n >= {GOPHER_MIN_TOKENS} AS INT) AS flag_word_count,
       CAST(sum_len >= {GOPHER_MIN_AVG_TOKEN_LEN} * n
            AND sum_len <= {GOPHER_MAX_AVG_TOKEN_LEN} * n AS INT)
         AS flag_mean_word_len,
       CAST(stop >= {GOPHER_MIN_STOP_HITS} AS INT) AS flag_stopwords,
       CAST(nd * {GOPHER_MIN_UNIQ_DEN} >= n * {GOPHER_MIN_UNIQ_NUM} AS INT)
         AS flag_unique_ratio,
       CAST(n >= {GOPHER_MIN_TOKENS}
            AND sum_len >= {GOPHER_MIN_AVG_TOKEN_LEN} * n
            AND sum_len <= {GOPHER_MAX_AVG_TOKEN_LEN} * n
            AND stop >= {GOPHER_MIN_STOP_HITS}
            AND nd * {GOPHER_MIN_UNIQ_DEN} >= n * {GOPHER_MIN_UNIQ_NUM}
            AS INT) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# Repetition scoring (boilerplate / generation-loop detection)
# ---------------------------------------------------------------------------

def repetition_score(
    documents: DataFrame,
    dup_ratio_gate: float = 0.3,
    top_count_gate: int = 5,
) -> DataFrame:
    """Intra-document repetition signals over word 3-grams: the fraction of
    duplicated trigram occurrences and the highest single-trigram repeat
    count, plus a composite ``is_repetitive`` gate.

    Catches the two corpus pathologies near-dup removal cannot: template
    boilerplate repeated *within* one page, and degenerate generation
    loops ("the the the ..."). Row-local higher-order-function work, zero
    shuffle — but ``top_gram_count`` is quadratic in the per-document
    distinct-trigram count (count each distinct gram's occurrences), so
    giant documents should be length-gated before this operator (the
    curation pipeline's ``min/max_tokens`` gate runs first for exactly
    this kind of reason).
    """
    toks = tokens("text")
    d = documents.select("doc_id", toks.alias("toks"))
    grams = F.expr(
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(0, size(toks) - 3),"
        " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
        " ELSE array() END"
    )
    d = d.select("doc_id", grams.alias("grams"))
    n = F.size("grams")
    n_distinct = F.size(F.array_distinct("grams"))
    top = F.when(n == 0, F.lit(0)).otherwise(
        F.array_max(
            F.expr(
                "transform(array_distinct(grams),"
                " g -> size(filter(grams, x -> x = g)))"
            )
        )
    )
    dup_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((n - n_distinct) / n, 4)
    )
    return d.select(
        "doc_id",
        n.alias("n_grams"),
        dup_ratio.alias("dup_gram_ratio"),
        top.alias("top_gram_count"),
        (
            (dup_ratio >= dup_ratio_gate) | (top >= top_count_gate)
        ).alias("is_repetitive"),
    )


def REPETITION_SCORE_SQL(
    dup_ratio_gate: float = 0.3, top_count_gate: int = 5
) -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL('text')} AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
         ELSE [] END AS grams
  FROM t
),
m AS (
  SELECT doc_id,
         len(grams) AS n_grams,
         len(list_distinct(grams)) AS n_distinct,
         CASE WHEN len(grams) = 0 THEN 0
              ELSE list_max(list_transform(list_distinct(grams),
                     g2 -> len(list_filter(grams, x -> x = g2)))) END AS top
  FROM g
),
s AS (
  SELECT doc_id, n_grams,
         CASE WHEN n_grams = 0 THEN 0.0
              ELSE round((n_grams - n_distinct) / CAST(n_grams AS DOUBLE), 4)
         END AS dup_gram_ratio,
         top AS top_gram_count
  FROM m
)
SELECT doc_id,
       CAST(n_grams AS INTEGER) AS n_grams,
       dup_gram_ratio,
       CAST(top_gram_count AS INTEGER) AS top_gram_count,
       (dup_gram_ratio >= {dup_ratio_gate} OR top_gram_count >= {top_count_gate})
         AS is_repetitive
FROM s
"""


# ---------------------------------------------------------------------------
# Language ID (marker-word argmax)
# ---------------------------------------------------------------------------

def language_id(documents: DataFrame) -> DataFrame:
    """Predict language as the marker set with the most token hits
    (deterministic tie-break: hit count desc, language asc; zero hits ->
    'und'). Pure per-row array expressions — no shuffle, no dim join."""
    d = documents.withColumn("toks", tokens("text"))
    hit_cols = [
        F.size(F.expr(f"filter(toks, t -> t IN ({_in_list_sql(markers)}))")).alias(
            f"hits_{lang}"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    labeled = (
        F.col("lang") if "lang" in documents.columns else F.lit(None).cast("string")
    )
    d = d.select("doc_id", labeled.alias("labeled_lang"), *hit_cols)
    # argmax via a greatest+case chain keeps it row-local (languages are
    # few and fixed; a dim-join argmax would shuffle for nothing)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), lang).otherwise(
            pred
        )
    return d.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        best.cast("long").alias("marker_hits"),
    )


def _lang_hits_sql() -> str:
    cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t IN ({_in_list_sql(markers)}))) AS hits_{lang}"
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    return cols


def _lang_case_sql() -> str:
    langs = sorted(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"hits_{la}" for la in langs) + ")"
    whens = "\n         ".join(
        f"WHEN hits_{la} = {greatest} THEN '{la}'" for la in langs
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und'\n         {whens} ELSE 'und' END"


LANGUAGE_ID_SQL = f"""
WITH t AS (SELECT *, {TOKENS_SQL('text')} AS toks FROM documents),
m AS (
  SELECT doc_id, lang AS labeled_lang,
         {_lang_hits_sql()}
  FROM t
)
SELECT doc_id, labeled_lang,
       {_lang_case_sql()} AS predicted_lang,
       CAST(greatest(hits_de, hits_en, hits_es, hits_fr) AS BIGINT) AS marker_hits
FROM m
"""


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprints: whole-document hash of whitespace-normalized
    text, a 64-char-prefix hash, and a 1-permutation minhash over word
    3-gram shingles (the min shingle hash — a winnowing-style content
    signature robust to reordering of later content)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    d = documents.withColumn("norm", norm).withColumn(
        "shingles", shingles_expr("norm")
    )
    return d.select(
        "doc_id",
        hash60(F.col("norm")).alias("content_fp"),
        hash60(F.substring("norm", 1, 64)).alias("prefix_fp"),
        F.array_min(F.expr(
            f"transform(shingles, s -> {_hash60_expr_sql('s')})"
        )).alias("min_shingle_fp"),
    )


def _hash60_expr_sql(expr: str) -> str:
    """hash60 as a Spark SQL-expression string (for use inside lambdas)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def shingles_expr(col_name: str) -> Column:
    """Distinct word-3-gram shingles of a normalized text column; documents
    with <3 tokens fall back to the whole text as a single shingle.

    The tokenization is hoisted into a scalar subexpression via a
    higher-order ``transform`` over a 1-element array: expressions INSIDE
    a lambda body are re-evaluated per element (Spark's subexpression
    elimination stops at lambda boundaries — the same trap as hashing
    inside minhash lambdas, measured ~2.5x on the posting build when
    ``split`` ran 3x per shingle window), so ``split`` must bind to a
    lambda variable, evaluated once per row, before the window transform
    consumes it."""
    return F.expr(
        f"""
        transform(array(split({col_name}, ' ')), toks ->
          CASE WHEN size(toks) >= 3 THEN
            array_distinct(transform(
              sequence(0, size(toks) - 3),
              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
          ELSE array({col_name}) END
        )[0]
        """
    )


def SHINGLES_SQL(expr: str) -> str:
    """DuckDB: distinct word-3-gram shingles of pre-normalized text
    (1-based list indexing)."""
    return f"""
    CASE WHEN len(string_split({expr}, ' ')) >= 3 THEN
      list_distinct(list_transform(
        generate_series(1, len(string_split({expr}, ' ')) - 2),
        i -> concat_ws(' ', string_split({expr}, ' ')[i],
             string_split({expr}, ' ')[i+1], string_split({expr}, ' ')[i+2])))
    ELSE [{expr}] END
    """


NORM_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

FINGERPRINT_SQL = f"""
WITH t AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
s AS (SELECT *, {SHINGLES_SQL('norm')} AS shingles FROM t)
SELECT doc_id,
       {HASH60_SQL('norm')} AS content_fp,
       {HASH60_SQL('substr(norm, 1, 64)')} AS prefix_fp,
       list_min(list_transform(shingles, s -> {HASH60_SQL('s')}))
         AS min_shingle_fp
FROM s
"""


# ---------------------------------------------------------------------------
# Corpus length histogram
# ---------------------------------------------------------------------------

def length_histogram(documents: DataFrame, bucket_chars: int = 100) -> DataFrame:
    """Document-length distribution in fixed-width buckets, with each
    bucket's share of the corpus — the first chart in any corpus report.

    Bucketing is row-local integer division; the aggregation keys are
    ~max_len/bucket_chars values, so the shuffle moves only histogram rows
    however large the corpus. The share is computed from a window total
    over the histogram itself (rollup-sized, not corpus-sized).
    """
    from pyspark.sql.window import Window

    hist = (
        documents.select(
            (F.floor(F.col("n_chars") / bucket_chars) * bucket_chars)
            .cast("long")
            .alias("bucket_lo"),
        )
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = Window.partitionBy()
    return hist.select(
        "bucket_lo",
        (F.col("bucket_lo") + bucket_chars).alias("bucket_hi"),
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4).alias("share"),
    )


def LENGTH_HISTOGRAM_SQL(bucket_chars: int = 100) -> str:
    return f"""
WITH hist AS (
  SELECT CAST(floor(n_chars / {bucket_chars}) * {bucket_chars} AS BIGINT)
           AS bucket_lo,
         count(*) AS n_docs
  FROM documents GROUP BY 1
)
SELECT bucket_lo, bucket_lo + {bucket_chars} AS bucket_hi,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 4) AS share
FROM hist
"""
