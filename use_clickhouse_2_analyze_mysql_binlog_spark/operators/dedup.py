"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

None of this exists in the reference (its only dedup-shaped logic is the
window idempotence guard, SURVEY.md §2.1 S11); these are the first-class
corpus operators a 100 TB pipeline needs.

Scale design:
- Exact dedup: hash-groupBy — one shuffle on a 60-bit content hash, keys
  are uniform (no skew by construction).
- MinHash+LSH: signatures are computed per-row with array expressions (no
  shuffle, no UDF); only the *band buckets* shuffle. Candidate pairs come
  from equi-joins on (band_id, band_hash) — at 100 TB this is the standard
  shingle->minhash->band->bucket-join pipeline; bucket sizes are the skew
  risk, handled by AQE skew-join plus the frequent-bucket cap.
- SimHash: 60-bit signature per row, candidates via 15-bit chunk buckets
  (pigeonhole: hamming<=3 over 4 chunks guarantees a shared chunk), exact
  hamming verify on candidates.
- n-gram Jaccard: exact pairwise verify via shingle-set intersection;
  the explode-join candidate generation is quadratic in per-shingle
  document frequency, so frequent shingles can be capped (``max_df``).

All hash math uses the engine-portable ``hash60``/``hash31`` (functions/
portable.py) so every operator has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.functions import (
    HASH31_SQL,
    HASH60_SQL,
    MINHASH_PRIME,
    hash60,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.operators.text import (
    NORM_SQL,
    SHINGLES_SQL,
    TOKENS_SQL,
    _hash60_expr_sql,
    shingles_expr,
    tokens,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, keeping the
    smallest doc_id as canonical. ``dup_count`` > 1 marks duplicate sets."""
    return (
        documents.withColumn("content_hash", hash60(F.col("text")))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


EXACT_DEDUP_SQL = f"""
SELECT {HASH60_SQL('text')} AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Shared: per-document shingle hash arrays
# ---------------------------------------------------------------------------

def _doc_shingles(documents: DataFrame) -> DataFrame:
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        documents.select("doc_id", norm.alias("norm"))
        .withColumn("shingles", shingles_expr("norm"))
        .withColumn(
            "sh_hashes",
            F.expr(f"transform(shingles, s -> {_hash60_expr_sql('s')})"),
        )
    )


_DOC_SHINGLES_SQL = f"""
  SELECT doc_id, {SHINGLES_SQL('norm')} AS shingles
  FROM (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
"""


def _pair_jaccard(cand: DataFrame, shingled: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via shingle sets."""
    sa = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.expr("filter(sh_a, s -> array_contains(sh_b, s))"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
    )


_PAIR_JACCARD_SQL = """
  SELECT doc_a, doc_b,
         round(
           len(list_filter(a.shingles, s -> list_contains(b.shingles, s)))
           / CAST(len(a.shingles) + len(b.shingles)
                  - len(list_filter(a.shingles, s -> list_contains(b.shingles, s)))
                  AS DOUBLE), 4) AS jaccard
  FROM cand JOIN shingled a ON cand.doc_a = a.doc_id
            JOIN shingled b ON cand.doc_b = b.doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact candidate generation via shared shingles)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """Near-duplicate pairs by exact word-3-gram Jaccard similarity.

    Candidates = document pairs sharing >=1 shingle (optionally ignoring
    shingles with document frequency > ``max_df`` — the scale lever; at
    100 TB frequent shingles otherwise create quadratic bucket blowups).
    """
    shingled = _doc_shingles(documents)
    posting = shingled.select(
        "doc_id", F.explode("sh_hashes").alias("sh")
    ).distinct()
    if max_df is not None:
        rare = (
            posting.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("sh")
        )
        posting = posting.join(rare, "sh")
    a = posting.select(F.col("sh"), F.col("doc_id").alias("doc_a"))
    b = posting.select(F.col("sh"), F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        _pair_jaccard(cand, shingled)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def NGRAM_JACCARD_SQL(threshold: float = 0.5) -> str:
    return f"""
WITH shingled AS ({_DOC_SHINGLES_SQL}),
posting AS (
  SELECT DISTINCT doc_id, {HASH60_SQL('sh.s')} AS sh
  FROM shingled, unnest(shingles) AS sh(s)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM posting a JOIN posting b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
pairs AS ({_PAIR_JACCARD_SQL})
SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

NUM_HASHES = 32
NUM_BANDS = 8  # 8 bands x 4 rows


def _minhash_sig_expr() -> str:
    """Spark SQL expr: 32-slot minhash signature from sh31 hash array.

    Permutation family h_i(x) = ((2i+1)*x + 7919*i + 1) mod (2^31-1);
    inputs are 31-bit so products stay far below 2^63.
    """
    return (
        f"transform(sequence(0, {NUM_HASHES - 1}), i -> "
        f"array_min(transform(sh31, x -> "
        f"((2*i + 1) * x + 7919*i + 1) % {MINHASH_PRIME}L)))"
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """Per-document minhash signature (array of 32 longs), no shuffle."""
    return (
        _doc_shingles(documents)
        .withColumn(
            "sh31", F.expr(f"transform(sh_hashes, h -> h % {MINHASH_PRIME}L)")
        )
        .withColumn("sig", F.expr(_minhash_sig_expr()))
        .select("doc_id", "shingles", "sig")
    )


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified by exact Jaccard.

    Pipeline: shingle -> minhash signature -> band hashes -> bucket
    equi-join -> distinct candidate pairs -> exact Jaccard >= threshold.
    Only band buckets shuffle; signatures never leave their row.
    """
    sigs = minhash_signatures(documents)
    rows_per_band = NUM_HASHES // NUM_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            hash60(
                F.array_join(
                    F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    "_",
                )
            ).alias("band_hash"),
        )
        for b in range(NUM_BANDS)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc_a"))
    b = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    shingled = _doc_shingles(documents)
    return (
        _pair_jaccard(cand, shingled)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def MINHASH_LSH_SQL(threshold: float = 0.5) -> str:
    rows_per_band = NUM_HASHES // NUM_BANDS
    return f"""
WITH shingled AS ({_DOC_SHINGLES_SQL}),
hashed AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {HASH31_SQL('s')}) AS sh31
  FROM shingled
),
sigs AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, {NUM_HASHES - 1}), i ->
           list_min(list_transform(sh31, x ->
             ((2*i + 1) * x + 7919*i + 1) % {MINHASH_PRIME}))) AS sig
  FROM hashed
),
bands AS (
  SELECT doc_id, b AS band_id,
         {HASH60_SQL(f"array_to_string(list_slice(sig, b*{rows_per_band} + 1, b*{rows_per_band} + {rows_per_band}), '_')")} AS band_hash
  FROM sigs, generate_series(0, {NUM_BANDS - 1}) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
pairs AS ({_PAIR_JACCARD_SQL})
SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # hash60 provides 60 usable bits
SIMHASH_CHUNKS = 4  # 15-bit chunks; hamming<=3 => >=1 chunk equal


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """60-bit SimHash over whitespace tokens (with multiplicity): bit j is
    set iff a strict majority of token hashes have bit j set. Pure array
    expressions, per-row."""
    d = documents.select("doc_id", tokens("text").alias("toks")).withColumn(
        "th", F.expr(f"transform(toks, t -> {_hash60_expr_sql('t')})")
    )
    sim = F.expr(
        f"aggregate(sequence(0, {SIMHASH_BITS - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc + CASE WHEN "
        f"2 * size(filter(th, h -> (shiftright(h, j) & 1) = 1)) > size(th) "
        f"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
    )
    return d.select("doc_id", sim.alias("simhash"))


SIMHASH_SIG_SQL = f"""
SELECT doc_id,
       CAST(list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}), j ->
         CASE WHEN 2 * len(list_filter(th, h -> ((h >> j) & 1) = 1)) > len(th)
              THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS simhash
FROM (
  SELECT doc_id,
         list_transform({TOKENS_SQL('text')}, t -> {HASH60_SQL('t')}) AS th
  FROM documents
)
"""


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= ``max_hamming``.

    Candidates come from 15-bit chunk buckets (pigeonhole over 4 chunks),
    then exact ``bit_count(xor)`` verify — the banded structure is what
    scales; brute-force pairing would be quadratic in corpus size.
    """
    sigs = simhash_signatures(documents)
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.expr(f"shiftright(simhash, {15 * c}) & 32767").alias("chunk_val"),
        )
        for c in range(SIMHASH_CHUNKS)
    ]
    chunks = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_structs)).alias("ch")
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    a = chunks.select(
        "chunk_id", "chunk_val",
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
    )
    b = chunks.select(
        "chunk_id", "chunk_val",
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sim_a ^ sim_b")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def SIMHASH_PAIRS_SQL(max_hamming: int = 3) -> str:
    return f"""
WITH sigs AS ({SIMHASH_SIG_SQL}),
chunks AS (
  SELECT doc_id, simhash, c AS chunk_id,
         (simhash >> (15 * c)) & 32767 AS chunk_val
  FROM sigs, generate_series(0, {SIMHASH_CHUNKS - 1}) AS t(c)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
