"""Ingest transform: decoded canal entries -> binlog fact rows.

Re-expresses the reference's per-entry Python loop
(``/root/reference/mon_mysql_dml.py:244-330``) as one declarative projection:

- P1 drop ``TRANSACTIONBEGIN`` entries     (``mon_mysql_dml.py:252-253``)
- P3 project 9 header + 2 row-change fields (``:257-263, :311-316``)
- P4 ``is_ddl`` flag                        (``:322``)
- P5 ``len(rowDatas)`` affected rows        (``:316``)
- P6 enum id -> name                        (``:313-314``)
- F8 epoch-millis -> timestamp              (``:326``)

Everything stays in whole-stage codegen (no UDFs): the enum mapping is a
literal map lookup, timestamps via ``timestamp_millis``. At 100 TB of
streamed binlog this projection is embarrassingly parallel — no shuffle at
all between Kafka partitions and the partitioned sink write.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.schemas import EVENT_TYPE_NAMES

_EVENT_TYPE_MAP: Column | None = None


def event_type_name(id_col: Column) -> Column:
    """Canal enum id -> name as a literal-map lookup (codegen-friendly)."""
    mapping = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(EVENT_TYPE_NAMES.items())]
    )
    return F.coalesce(
        F.element_at(mapping, id_col),
        F.concat(F.lit("UNKNOWN_"), id_col.cast("string")),
    )


def canal_entries_to_binlog(
    entries: DataFrame, ctime: Column | None = None
) -> DataFrame:
    """Transform CANAL_ENTRY_SCHEMA rows into BINLOG_EVENT_SCHEMA rows.

    ``ctime`` defaults to ``current_timestamp()`` (the reference's
    ``ctime DateTime DEFAULT now()``, README.md:112); pass a literal for
    deterministic tests.
    """
    if ctime is None:
        ctime = F.current_timestamp()
    h = F.col("header")
    return entries.filter(F.col("entryType") != "TRANSACTIONBEGIN").select(
        F.coalesce(h["schemaName"], F.lit("")).alias("schema"),
        F.coalesce(h["tableName"], F.lit("")).alias("table"),
        event_type_name(h["eventType"]).alias("event_type"),
        F.when(F.col("isDdl"), F.lit(1)).otherwise(F.lit(0)).alias("is_ddl"),
        F.coalesce(h["logfileName"], F.lit("")).alias("binlog_file"),
        h["logfileOffset"].cast("long").alias("binlog_pos"),
        F.coalesce(h["serverenCode"], F.lit("")).alias("characterset"),
        F.timestamp_millis(h["executeTime"]).alias("execute_time"),
        F.coalesce(h["gtid"], F.lit("")).alias("gtid"),
        F.size("rowDatas").cast("long").alias("single_statement_affected_rows"),
        h["eventLength"].cast("long").alias("single_statement_size"),
        ctime.alias("ctime"),
    )
