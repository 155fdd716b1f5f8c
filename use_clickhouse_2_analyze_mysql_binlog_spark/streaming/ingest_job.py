"""Streaming ingest: canal entries -> checkpointed fact-table append (E1).

The reference's consume->decode->buffer->insert loop
(``/root/reference/mon_mysql_dml.py:215-335``) becomes a Structured
Streaming pipeline. Its at-most-once gap (offsets auto-commit independently
of the flush, so a crash loses up to ``sync`` buffered events — SURVEY.md
§3-E1) disappears: offsets live in the checkpoint and commit atomically
with each sink epoch.

Source-agnostic by design: production wires the Kafka reader + protobuf
decode (sources/kafka.py, sources/canal.py); tests feed a file-source
stream of pre-decoded entries. Everything downstream is identical.

The sink appends day-partitioned parquet in the layout of
plans/storage.py; the 5000-row flush batching (W4) maps to
``maxOffsetsPerTrigger``/trigger cadence, not sink logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from use_clickhouse_2_analyze_mysql_binlog_spark.sources.transform import (
    canal_entries_to_binlog,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import epochs


def make_append_batch(sink_path: str, files_per_batch_day: int = 1):
    """The per-epoch append body (module-level so replay behavior is
    unit-testable). foreachBatch (vs direct file sink) so the write can
    coalesce and sort within partitions like the batch layout writer.
    Replay protection: a committed-epoch marker written after the append
    makes a replayed epoch a no-op (the marker is only absent if the data
    write itself did not complete, in which case re-appending is the
    at-least-once recovery; swap the sink for a transactional table format
    to close that last window at production scale)."""

    def append_batch(batch: DataFrame, epoch: int) -> None:
        if epochs.epoch_committed(sink_path, epoch):
            return
        (
            batch.repartition(files_per_batch_day, "day")
            .sortWithinPartitions("execute_time", "gtid", "table", "schema")
            .write.mode("append")
            .partitionBy("day")
            .parquet(sink_path)
        )
        epochs.mark_epoch_committed(sink_path, epoch)

    return append_batch


def run_ingest_stream(
    entries_stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    files_per_batch_day: int = 1,
) -> StreamingQuery:
    """Start the ingest stream: entries -> binlog rows -> partitioned append.

    ``available_now=True`` drains the current source content and stops
    (used by tests and backfills); otherwise the stream runs continuously.
    """
    binlog = canal_entries_to_binlog(entries_stream).withColumn(
        "day", F.to_date("execute_time")
    )
    append_batch = make_append_batch(sink_path, files_per_batch_day)
    writer = (
        binlog.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(append_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
