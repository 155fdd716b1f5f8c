"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (windowed transaction analytics,
the reference's core — ``compute_transaction_info.py:53-66``) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from use_clickhouse_2_analyze_mysql_binlog_spark import queries_registry as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return R.QUERIES["transaction_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(R.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return dict(R.ORACLES)
