"""Registry wiring every implemented operator to the driver contract.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB SQL oracle over the same parquet tables. Column names and
derivations match exactly on both sides (the driver hash-compares values
after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from use_clickhouse_2_analyze_mysql_binlog_spark import schemas
from use_clickhouse_2_analyze_mysql_binlog_spark.operators import transactions

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _binlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return schemas.binlog_view(schemas.load_table(spark, sf_dir, "events"))


# SQL fragment shared by the binlog-analytics oracles: the events->binlog
# mapping (schemas.BINLOG_VIEW_SQL) followed by the per-window per-gtid stats
# (compute_transaction_info.py:53-66 semantics).
_STATS_CTE = f"""
WITH binlog AS ({schemas.BINLOG_VIEW_SQL}),
stats AS (
  SELECT
    strftime(time_bucket(INTERVAL '5 minutes', execute_time),
             '%Y-%m-%d %H:%M:%S')                             AS window_start,
    strftime(time_bucket(INTERVAL '5 minutes', execute_time)
             + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S')     AS end_time,
    gtid,
    CAST(floor((epoch_ms(max(execute_time)) - epoch_ms(min(execute_time)))
               / 1000.0) AS BIGINT)                           AS transaction_spend_time,
    max(binlog_pos) - min(binlog_pos)
      + max_by(single_statement_size, binlog_pos)             AS transaction_size,
    CAST(sum(single_statement_affected_rows) AS BIGINT)      AS transaction_affected_rows,
    count(*)                                                  AS statement_count
  FROM binlog
  GROUP BY time_bucket(INTERVAL '5 minutes', execute_time), gtid
)
"""


@register(
    "transaction_stats",
    _STATS_CTE + "SELECT * FROM stats",
)
def transaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 + W1: per-(5-min window, gtid) transaction metrics."""
    return transactions.transaction_stats(_binlog(spark, sf_dir))


def _top_oracle(metric: str) -> str:
    return (
        _STATS_CTE
        + f"""
, ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY window_start ORDER BY {metric} DESC, gtid ASC) AS rn
  FROM stats
)
SELECT window_start, end_time, gtid, transaction_spend_time,
       transaction_size, transaction_affected_rows, statement_count
FROM ranked WHERE rn = 1
"""
    )


def _register_top(metric: str) -> None:
    @register(f"top_transaction_by_{metric.removeprefix('transaction_')}",
              _top_oracle(metric))
    def _q(spark: SparkSession, sf_dir: str, _m=metric) -> DataFrame:
        return transactions.top_transactions(
            transactions.transaction_stats(_binlog(spark, sf_dir)), _m
        )


for _metric in transactions.METRICS:
    _register_top(_metric)


@register(
    "transaction_result_table",
    _STATS_CTE
    + """
, ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY window_start ORDER BY transaction_size DESC, gtid ASC) AS rn
  FROM stats
)
SELECT end_time, '300' AS invertal, gtid, transaction_spend_time,
       transaction_size,
       transaction_affected_rows AS single_statement_affected_rows
FROM ranked WHERE rn = 1
""",
)
def transaction_result_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-table shape (README.md:268-281), largest-transaction variant."""
    return transactions.transaction_result_table(
        transactions.transaction_stats(_binlog(spark, sf_dir)), "transaction_size"
    )
