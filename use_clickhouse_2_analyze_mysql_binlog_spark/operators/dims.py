"""Dimension-table joins the reference's semantics imply (SURVEY.md §2.3).

The reference has no SQL joins; its two join-shaped computations are the
canal enum->name mapping done in Python (``mon_mysql_dml.py:313-314``, P6)
and the idempotence existence-check before each result insert
(``compute_transaction_info.py:132-142``, S11). Both are expressed here as
real joins so the engine's join paths are exercised:

- P6 -> broadcast hash join against a 15-row event-type dim (at 100 TB the
  dim side must broadcast — never shuffle the fact table for this).
- S11 -> left-anti join against the already-computed window keys (replaces
  the reference's racy count()-then-insert with a set-difference that is
  idempotent under re-runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.schemas import (
    DDL_EVENT_TYPES,
    EVENT_TYPE_NAMES,
)


def event_type_dim(spark: SparkSession) -> DataFrame:
    """The canal EventType enum as a 15-row dim (id, name, ddl flag).

    Built as a SQL VALUES literal (LocalRelation) rather than
    ``createDataFrame``: the latter wraps a Python RDD, which costs a
    driver job + serialization round just to broadcast 15 rows, and its
    ExistingRDD plan blocks constant folding into the broadcast."""
    rows = ", ".join(
        f"({i}, '{name}', {1 if name in DDL_EVENT_TYPES else 0})"
        for i, name in sorted(EVENT_TYPE_NAMES.items())
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(event_type_id, event_type_name, is_ddl)"
    )


def decode_event_types(df: DataFrame, dim: DataFrame, id_col: str) -> DataFrame:
    """P6 — map enum ids to names via an explicitly broadcast dim join."""
    return df.join(F.broadcast(dim), df[id_col] == dim["event_type_id"], "left")


def anti_join_new_windows(
    stats: DataFrame, computed: DataFrame, key: str = "end_time"
) -> DataFrame:
    """S11 — keep only windows whose ``key`` is absent from ``computed``.

    The reference guards inserts with ``SELECT count(*) WHERE end_time = X``
    (compute_transaction_info.py:135-136) — a per-window point lookup. As a
    set operation this is one left-anti join; with the computed side small
    (one row per 5-min window) it broadcasts.
    """
    return stats.join(
        F.broadcast(computed.select(key).distinct()), on=key, how="left_anti"
    )
