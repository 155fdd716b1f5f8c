"""Daily rollups + SummingMergeTree semantics (SURVEY.md §2.4, §3-E3).

The reference maintains two SummingMergeTree materialized views over the fact
table: daily event-type counts (``/root/reference/README.md:155-195``) and
daily per-table event-type counts (``README.md:206-257``). Rows with equal
sort key are lazily merged by summing (``README.md:143-145``), so correct
ClickHouse reads must re-aggregate; our rollups expose *fully merged* results
(stronger contract, same answers — SURVEY.md §3-E3).

Scale notes: both rollups are low-cardinality groupBys (days x event types
[x tables]) — partial aggregation collapses nearly everything map-side, the
shuffle moves only #distinct-keys rows per task. At 100 TB this is the
cheapest possible plan; no repartitioning needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_FMT = "yyyy-MM-dd"


def daily_event_counts(binlog: DataFrame) -> DataFrame:
    """A5 — ``count(*) GROUP BY toDate(execute_time), event_type``
    (README.md:174-184). ``day`` emitted as a string for engine-portable
    comparison."""
    return (
        binlog.groupBy(
            F.date_format("execute_time", DAY_FMT).alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


def daily_event_counts_by_table(binlog: DataFrame) -> DataFrame:
    """A6 — 4-key variant ``GROUP BY day, schema, table, event_type``
    (README.md:229-245)."""
    return (
        binlog.groupBy(
            F.date_format("execute_time", DAY_FMT).alias("day"),
            "schema",
            "table",
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


def summing_merge(
    partials: DataFrame, keys: Sequence[str], metrics: Sequence[str]
) -> DataFrame:
    """A8 — SummingMergeTree merge: collapse rows with equal sort key by
    summing metric columns (README.md:143-145).

    This is the read-side re-aggregation ClickHouse requires on a Summing
    table whose background merges haven't finished; applying it makes any
    partial-aggregate rollup state exact.
    """
    return partials.groupBy(*keys).agg(
        *[F.sum(m).cast("long").alias(m) for m in metrics]
    )


def simulate_mv_partials(binlog: DataFrame, blocks: int = 8) -> DataFrame:
    """Emulate the per-insert-block partial aggregates a ClickHouse MV writes
    (README.md:168-184 fire per inserted block): split the fact table into
    ``blocks`` pseudo insert batches and count within each.

    Feeding this to :func:`summing_merge` must reproduce
    :func:`daily_event_counts` exactly — that equivalence is the oracle.
    """
    return (
        binlog.withColumn("block_id", (F.col("binlog_pos") % blocks))
        .groupBy(
            F.date_format("execute_time", DAY_FMT).alias("day"),
            "event_type",
            "block_id",
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
