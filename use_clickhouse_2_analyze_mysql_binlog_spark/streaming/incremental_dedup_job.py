"""Streaming incremental near-dup dedup: each micro-batch of documents is
MinHash-LSH-matched against the accumulated corpus BEFORE being appended —
the streaming form of ``operators/dedup.py::incremental_dedup_pairs``.

Corpus state lives in three tables under one transactional root
(``streaming/epochs.py::TxnSink``):

- ``corpus``  — surviving documents (what downstream reads)
- ``bands``   — (doc_id, band_id, band_hash) LSH bucket rows
- ``sh_sets`` — (doc_id, sh_set) distinct-shingle-hash arrays

Per epoch: the batch's signatures/bands/hash-sets are computed batch-side
(tiny), candidates come from the equi-join of batch bands against the
committed corpus bands, candidates are verified by exact Jaccard against
the committed hash-sets, and near-dup batch docs are dropped. Survivors
are staged to per-epoch directories for ALL THREE tables and committed by
ONE atomic manifest update — so an epoch is either fully visible (corpus +
bands + sh_sets together) or not at all. A crash at any point before the
commit leaves only invisible staging data that the replayed epoch
overwrites; there is no state in which corpus rows exist without their
bands/sh_sets (the r02 partial-append hazard), and the corpus never
double-ingests.

Scale shape: identical to the batch operator's 100 TB story — incremental
cost is O(batch) band rows joined into bucket-partitioned staging tables,
never a rescan of the corpus. Exact dups inside one batch collapse via
content-hash ``dropDuplicates``; near-dups *within* one micro-batch are
deliberately left to the periodic batch LSH pass over the corpus (the
batch-vs-corpus contract keeps per-epoch state joins one-directional).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from use_clickhouse_2_analyze_mysql_binlog_spark.functions import hash60
from use_clickhouse_2_analyze_mysql_binlog_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    _band_buckets,
    _doc_hash_sets,
    _pair_jaccard,
    _shingle_posting,
    minhash_signatures,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import epochs

TABLES = ("corpus", "bands", "sh_sets")


def make_dedup_batch(
    root: str,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    run_id: str = "local",
    gopher: bool = False,
):
    """Per-epoch body (module-level so replay behavior is unit-testable,
    same pattern as ingest_job.make_append_batch). ``gopher=True`` applies
    the Gopher hard-rule pre-gate to each batch BEFORE dedup — the
    streaming twin of the batch pipeline's ``--gopher`` (row-local, fuses
    into the batch scan; gated-out docs never enter the corpus, its bands,
    or its hash sets)."""

    sink = epochs.TxnSink(root, TABLES, run_id)

    def process_batch(batch: DataFrame, epoch: int) -> None:
        if sink.epoch_committed(epoch):
            return
        spark = batch.sparkSession
        if gopher:
            from use_clickhouse_2_analyze_mysql_binlog_spark.operators.text import (
                gopher_gate,
            )

            batch = gopher_gate(batch)
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

        if sink.has_data("bands"):
            old_bands = sink.read(spark, "bands")
            old_sets = sink.read(spark, "sh_sets")
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
            # stage all three tables, then ONE atomic commit: the epoch is
            # fully visible or not at all — a crash anywhere above the
            # commit leaves only invisible staging dirs the replay rewrites
            sink.write("corpus", epoch, survivors)
            surviving_ids = survivors.select("doc_id")
            sink.write("bands", epoch, new_bands.join(surviving_ids, "doc_id"))
            sink.write("sh_sets", epoch, new_sets.join(surviving_ids, "doc_id"))
            sink.commit(epoch)
        finally:
            # per-epoch caches must not accumulate across a long-running
            # stream (LRU eviction would save memory but thrash; explicit
            # release keeps the epoch's footprint bounded). new_sets is in
            # the list because _doc_hash_sets persists internally since
            # the family-reuse change in operators/dedup.py.
            for df in (survivors, new_bands, new_sets, posting, batch):
                df.unpersist()

    return process_batch


def run_incremental_dedup_stream(
    doc_stream: DataFrame,
    root: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    available_now: bool = False,
    gopher: bool = False,
) -> StreamingQuery:
    """Start the stream: documents -> batch-vs-corpus LSH dedup -> corpus
    append (exactly-once: per-epoch staging + one atomic commit across the
    three state tables; the run id is derived from the checkpoint so a
    fresh checkpoint's restarted epoch counter cannot collide)."""
    writer = (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            make_dedup_batch(
                root,
                threshold=threshold,
                run_id=epochs.run_id_for(checkpoint_path),
                gopher=gopher,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    """The committed corpus (uncommitted epoch staging is invisible)."""
    return epochs.TxnSink(root, TABLES).read(spark, "corpus")
