"""Analytic window functions + session windows (SURVEY.md §2.5, §2.8 W6).

The reference implements **no** analytic window functions — its author
explicitly laments their absence in 2020 ClickHouse, wishing for the Oracle
form ``sum(...) over (partition by gtid order by execute_time range between
... preceding)`` (``/root/reference/README.md:376-380``). Spark has the full
surface natively; this module provides exactly that wished-for operator plus
the session-window operator the reference lacks (its transactions are
delimited by gtid equality, not gaps — W6 'not present').

Scale notes: analytic windows shuffle once on the partition key (gtid —
high cardinality, uniform); ``rangeBetween`` on event-time seconds keeps
state bounded by the range width. Session windows use Spark's native
``session_window`` (merging state machine; streaming-capable with
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.operators.transactions import TS_FMT


def running_transaction_size(
    binlog: DataFrame, range_seconds: int = 3600
) -> DataFrame:
    """The reference author's wished-for query (README.md:376-380): per
    gtid, a running sum of statement sizes over a trailing event-time
    range window."""
    w = (
        Window.partitionBy("gtid")
        .orderBy(F.unix_timestamp("execute_time"))
        .rangeBetween(-range_seconds, 0)
    )
    w_rows = Window.partitionBy("gtid").orderBy(
        F.unix_timestamp("execute_time"), F.col("binlog_pos")
    )
    return binlog.select(
        "gtid",
        "binlog_pos",
        F.date_format("execute_time", TS_FMT).alias("execute_time"),
        F.sum("single_statement_size").over(w).alias("trailing_size_sum"),
        F.row_number().over(w_rows).alias("stmt_seq"),
        F.lag("single_statement_size", 1).over(w_rows).alias("prev_size"),
        (
            F.col("single_statement_size")
            - F.lag("single_statement_size", 1).over(w_rows)
        ).alias("size_delta"),
    )


def RUNNING_TRANSACTION_SIZE_SQL(binlog_sql: str, range_seconds: int = 3600) -> str:
    return f"""
WITH binlog AS ({binlog_sql})
SELECT gtid, binlog_pos,
       strftime(execute_time, '%Y-%m-%d %H:%M:%S') AS execute_time,
       CAST(sum(single_statement_size) OVER (
         PARTITION BY gtid
         ORDER BY CAST(floor(epoch(execute_time)) AS BIGINT)
         RANGE BETWEEN {range_seconds} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_size_sum,
       row_number() OVER w AS stmt_seq,
       lag(single_statement_size, 1) OVER w AS prev_size,
       single_statement_size - lag(single_statement_size, 1) OVER w
         AS size_delta
FROM binlog
WINDOW w AS (PARTITION BY gtid
             ORDER BY CAST(floor(epoch(execute_time)) AS BIGINT), binlog_pos)
"""


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """W6 — session windows: activity runs per user separated by >= gap of
    silence. Uses Spark's native ``session_window`` (works identically in
    batch and streaming+watermark)."""
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(time_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor("value").cast("long")).alias("value_sum"),
        )
        .select(
            user_col,
            F.date_format("sw.start", TS_FMT).alias("session_start"),
            F.date_format("sw.end", TS_FMT).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def SESSION_WINDOWS_SQL(gap_minutes: int = 30) -> str:
    """Gaps-and-islands formulation of session windows for the oracle.

    Spark's session_window end = last event + gap (the session's expiry
    time), matching ``max(ts) + gap`` here.
    """
    return f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts)) >= {gap_minutes * 60}
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
numbered AS (
  SELECT *, sum(is_start) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL {gap_minutes} MINUTE,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS value_sum
FROM numbered
GROUP BY user_id, session_id
"""


def event_count_cube(binlog: DataFrame) -> DataFrame:
    """A10 — CUBE over (day, event_type): all grouping-set combinations
    with counts and distinct-gtid counts; NULL dimension = 'ALL'."""
    return (
        binlog.cube(
            F.date_format("execute_time", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("gtid").alias("distinct_gtids"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "event_count",
            "distinct_gtids",
        )
    )


def EVENT_COUNT_CUBE_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql})
SELECT coalesce(strftime(execute_time, '%Y-%m-%d'), 'ALL') AS day,
       coalesce(event_type, 'ALL') AS event_type,
       count(*) AS event_count,
       count(DISTINCT gtid) AS distinct_gtids
FROM binlog
GROUP BY CUBE (strftime(execute_time, '%Y-%m-%d'), event_type)
"""


def multi_cluster_union(clusters: dict[str, DataFrame]) -> DataFrame:
    """W7 — per-source fan-out: the reference loops the same queries over 3
    source clusters (compute_transaction_info.py:156,166-172); in Spark the
    sources union with a cluster tag and one job covers all of them."""
    tagged = [
        df.withColumn("cluster", F.lit(name)) for name, df in sorted(clusters.items())
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


def multi_cluster_daily_counts(clusters: dict[str, DataFrame]) -> DataFrame:
    union = multi_cluster_union(clusters)
    return union.groupBy(
        "cluster",
        F.date_format("execute_time", "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("event_count"))


def binlog_gap_report(binlog: DataFrame, min_gap: int = 4) -> DataFrame:
    """Per-binlog-file position-continuity audit.

    The reference's ingest assumes binlog positions advance contiguously
    per file (the transaction_size formula depends on it — worked example
    ``mon_mysql_dml.py:264-310``); a position jump larger than expected
    means lost events between the Kafka topic and the fact table. One row
    per file: event count, position span, number of over-threshold jumps,
    and the largest jump.

    Plan: lag window partitioned by ``binlog_file`` + a groupBy on the SAME
    key — Catalyst reuses the window's hash partitioning for the aggregate,
    so the whole audit is ONE shuffle at any scale.
    """
    w = Window.partitionBy("binlog_file").orderBy("binlog_pos")
    delta = F.col("binlog_pos") - F.lag("binlog_pos", 1).over(w)
    return (
        binlog.select("binlog_file", "binlog_pos")
        .withColumn("delta", delta)
        .groupBy("binlog_file")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("binlog_pos").alias("first_pos"),
            F.max("binlog_pos").alias("last_pos"),
            # coalesce: a single-event file has only a NULL delta, and
            # sum(all-NULL) is NULL while the oracle's CASE..ELSE 0 sums
            # to 0 — pin both engines to 0 (ADVICE r03)
            F.coalesce(
                F.sum((F.col("delta") >= min_gap).cast("long")), F.lit(0)
            ).alias("n_gaps"),
            F.max("delta").alias("max_jump"),
        )
    )


def BINLOG_GAP_SQL(binlog_sql: str, min_gap: int = 4) -> str:
    return f"""
WITH binlog AS ({binlog_sql}),
deltas AS (
  SELECT binlog_file, binlog_pos,
         binlog_pos - lag(binlog_pos, 1) OVER (
           PARTITION BY binlog_file ORDER BY binlog_pos) AS delta
  FROM binlog
)
SELECT binlog_file, count(*) AS n_events,
       min(binlog_pos) AS first_pos, max(binlog_pos) AS last_pos,
       CAST(sum(CASE WHEN delta >= {min_gap} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       max(delta) AS max_jump
FROM deltas
GROUP BY binlog_file
"""
