"""Streaming exact deduplication: at-least-once sources -> exactly-once rows.

The reference's ingest is at-most-once (SURVEY.md §3-E1) but a Kafka source
replayed from an earlier offset (or a producer retry) delivers duplicates;
a training-data ingest must drop them. Spark's stateful
``dropDuplicatesWithinWatermark`` keeps one row per key with state bounded
by the watermark delay — the streaming analogue of the batch
``dedup_exact`` hash-groupBy (operators/dedup.py), and the right tool at
100 TB because the key-state never outlives the lateness bound (unbounded
``dropDuplicates`` state would grow with the stream).

Key choice: (binlog_file, binlog_pos) identifies a binlog statement
globally (positions are unique within a file — SURVEY.md §7 risk notes);
``gtid`` alone would collapse whole transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

DEDUP_KEYS = ("binlog_file", "binlog_pos")


def dedup_stream(
    binlog_stream: DataFrame,
    allowed_lateness: str = "5 minutes",
    keys: tuple[str, ...] = DEDUP_KEYS,
) -> DataFrame:
    """Keep the first arrival of every (binlog_file, binlog_pos) within the
    watermark horizon; replays/retries inside the horizon are dropped."""
    return binlog_stream.withWatermark(
        "execute_time", allowed_lateness
    ).dropDuplicatesWithinWatermark(list(keys))


def run_dedup_stream(
    binlog_stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    allowed_lateness: str = "5 minutes",
    available_now: bool = False,
) -> StreamingQuery:
    writer = (
        dedup_stream(binlog_stream, allowed_lateness)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
