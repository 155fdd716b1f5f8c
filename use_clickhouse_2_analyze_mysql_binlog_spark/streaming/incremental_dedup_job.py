"""Streaming incremental near-dup dedup: each micro-batch of documents is
MinHash-LSH-matched against the accumulated corpus BEFORE being appended —
the streaming form of ``operators/dedup.py::incremental_dedup_pairs``.

Corpus state lives in two staging tables next to the corpus itself:

- ``<root>/corpus``  — surviving documents (what downstream reads)
- ``<root>/bands``   — (doc_id, band_id, band_hash) LSH bucket rows
- ``<root>/sh_sets`` — (doc_id, sh_set) distinct-shingle-hash arrays

Per epoch: the batch's signatures/bands/hash-sets are computed batch-side
(tiny), candidates come from the equi-join of batch bands against the
staged corpus bands, candidates are verified by exact Jaccard against the
staged hash-sets, and near-dup batch docs are dropped. Survivors append to
all three tables atomically-enough via the committed-epoch marker
(streaming/epochs.py): a replayed epoch is a no-op, so the corpus never
double-ingests.

Scale shape: identical to the batch operator's 100 TB story — incremental
cost is O(batch) band rows joined into bucket-partitioned staging tables,
never a rescan of the corpus. Exact dups inside one batch collapse via
content-hash ``dropDuplicates``; near-dups *within* one micro-batch are
deliberately left to the periodic batch LSH pass over the corpus (the
batch-vs-corpus contract keeps per-epoch state joins one-directional).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from use_clickhouse_2_analyze_mysql_binlog_spark.functions import hash60
from use_clickhouse_2_analyze_mysql_binlog_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    _band_buckets,
    _doc_hash_sets,
    _shingle_posting,
    minhash_signatures,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import epochs


def _paths(root: str) -> tuple[str, str, str]:
    return (
        os.path.join(root, "corpus"),
        os.path.join(root, "bands"),
        os.path.join(root, "sh_sets"),
    )


def make_dedup_batch(
    root: str,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
):
    """Per-epoch body (module-level so replay behavior is unit-testable,
    same pattern as ingest_job.make_append_batch)."""

    corpus_path, bands_path, sets_path = _paths(root)

    def process_batch(batch: DataFrame, epoch: int) -> None:
        if epochs.epoch_committed(root, epoch):
            return
        spark = batch.sparkSession
        # exact dups inside the batch: keep-first on content hash
        batch = (
            batch.withColumn("_ch", hash60(F.col("text")))
            .dropDuplicates(["_ch"])
            .drop("_ch")
            .persist()
        )
        posting = _shingle_posting(batch, persist=True)
        new_bands = _band_buckets(
            minhash_signatures(batch, posting), max_bucket
        ).persist()
        new_sets = _doc_hash_sets(batch, posting)

        if os.path.exists(bands_path):
            old_bands = spark.read.parquet(bands_path)
            old_sets = spark.read.parquet(sets_path)
            cand = (
                new_bands.select(
                    "band_id", "band_hash", F.col("doc_id").alias("doc_a")
                )
                .join(
                    old_bands.select(
                        "band_id", "band_hash", F.col("doc_id").alias("doc_b")
                    ),
                    ["band_id", "band_hash"],
                )
                .select("doc_a", "doc_b")
                .distinct()
            )
            # verify with exact Jaccard: batch-side sets union the staged
            # corpus sets (doc ids are globally unique across the stream)
            from use_clickhouse_2_analyze_mysql_binlog_spark.operators.dedup import (
                _pair_jaccard,
            )

            sets_all = new_sets.unionByName(old_sets)
            drops = (
                _pair_jaccard(cand, sets_all)
                .filter(F.col("jaccard") >= threshold)
                .select(F.col("doc_a").alias("doc_id"))
                .distinct()
            )
            survivors = batch.join(drops, "doc_id", "left_anti").persist()
        else:
            survivors = batch

        try:
            survivors.write.mode("append").parquet(corpus_path)
            surviving_ids = survivors.select("doc_id")
            new_bands.join(surviving_ids, "doc_id").write.mode("append").parquet(
                bands_path
            )
            new_sets.join(surviving_ids, "doc_id").write.mode("append").parquet(
                sets_path
            )
            epochs.mark_epoch_committed(root, epoch)
        finally:
            # per-epoch caches must not accumulate across a long-running
            # stream (LRU eviction would save memory but thrash; explicit
            # release keeps the epoch's footprint bounded)
            for df in (survivors, new_bands, posting, batch):
                df.unpersist()

    return process_batch


def run_incremental_dedup_stream(
    doc_stream: DataFrame,
    root: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the stream: documents -> batch-vs-corpus LSH dedup -> corpus
    append (exactly-once under epoch replay)."""
    writer = (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(make_dedup_batch(root, threshold=threshold))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
