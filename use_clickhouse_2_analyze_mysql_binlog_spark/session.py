"""SparkSession factory tuned for the binlog-analytics workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are the
ones we would ship to a 1000-executor cluster — AQE handles runtime partition
coalescing and skew joins, so ``spark.sql.shuffle.partitions`` is only an
upper bound for the local runs (on a real cluster it would be sized to
~2-3x total cores or left to AQE's initialPartitionNum).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale (see SURVEY.md §4):
#  - AQE on: runtime coalescing, skew-join splitting, dynamic join strategy
#    switch — this is what makes a fixed shuffle.partitions safe at 100 TB.
#  - Arrow on: any pandas UDF path (canal decode fallback, multimodal,
#    embedding ops) gets vectorized batch transfer.
#  - UTC session timezone: binlog execute_time semantics are wall-clock
#    naive; pinning UTC makes parquet timestamp round-trips deterministic.
_DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB scan splits (default) are right for the 110 GB/8B-row reference
    # scale and beyond; parquet filter pushdown + partition pruning do the
    # rest (SURVEY.md §1.4, §4).
    "spark.sql.parquet.filterPushdown": "true",
    # Older driver testdata stores events.ts as TIMESTAMP(NANOS) parquet,
    # which Spark 4 refuses by default; read as long and convert in the
    # loader (schemas.load_table) with integer division (no precision loss).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Round-3+ testdata uses naive TIMESTAMP(MICROS); read as plain
    # TIMESTAMP (not NTZ) so window/unix_millis arithmetic and the UTC
    # session mapping behave identically to the nanos generation.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.parquet.aggregatePushdown": "true",
    # The event-type dim (16 rows) and window-bound lookups must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "32m",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # Shuffle files are deleted only when their ShuffleDependency is
    # garbage-collected; on a large heap a long-lived session can run for
    # ages without a full GC, so spilled shuffle data ACCUMULATES on local
    # disk across queries (round-13 sf100 probe: three consecutive heavy
    # dedup queries left ~70 GB of dead shuffle files and the fourth
    # filled the volume). Spark's ContextCleaner already has the knob —
    # periodic forced GC — but its 30min default outlives a multi-query
    # burst; 5min bounds dead-shuffle residency at a negligible full-GC
    # cost and is the setting we'd ship to long-lived cluster sessions.
    "spark.cleaner.periodicGC.interval": "5min",
}


def get_spark(
    app_name: str = "use_clickhouse_2_analyze_mysql_binlog_spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster, pass None and submit with ``--master``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    merged = dict(_DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
