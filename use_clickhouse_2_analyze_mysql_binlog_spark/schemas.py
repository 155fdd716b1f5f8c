"""Schemas and table loaders.

The reference declares all schemas as explicit ClickHouse DDL
(``/root/reference/README.md:99-138``); the ingest side produces row dicts
whose keys are hard-coded (``/root/reference/mon_mysql_dml.py:318-330``).
Here both are fixed Spark ``StructType``s (SURVEY.md §1.2-1.3): string-typed
numerics of the reference (``binlog_pos``, ``single_statement_size`` —
``README.md:106,111``) are stored natively as LongType, so the reference's
query-time ``toUInt32`` casts (``compute_transaction_info.py:59``) become
no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Binlog fact table — mysql_monitor.broker_binlog_local (README.md:99-118)
# ---------------------------------------------------------------------------

BINLOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("schema", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("is_ddl", T.IntegerType(), False),
        T.StructField("binlog_file", T.StringType(), False),
        T.StructField("binlog_pos", T.LongType(), False),
        T.StructField("characterset", T.StringType(), False),
        T.StructField("execute_time", T.TimestampType(), False),
        T.StructField("gtid", T.StringType(), False),
        T.StructField("single_statement_affected_rows", T.LongType(), False),
        T.StructField("single_statement_size", T.LongType(), False),
        T.StructField("ctime", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Canal wire shape, pre-decode (mon_mysql_dml.py:244-330; FIXTURES.md §2)
# ---------------------------------------------------------------------------

CANAL_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("schemaName", T.StringType(), True),
        T.StructField("tableName", T.StringType(), True),
        T.StructField("logfileName", T.StringType(), True),
        T.StructField("logfileOffset", T.LongType(), True),
        T.StructField("serverenCode", T.StringType(), True),
        T.StructField("executeTime", T.LongType(), True),  # epoch millis
        T.StructField("eventLength", T.LongType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("eventType", T.IntegerType(), True),  # canal enum
    ]
)

CANAL_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("entryType", T.StringType(), True),
        T.StructField("header", CANAL_HEADER_SCHEMA, True),
        T.StructField("isDdl", T.BooleanType(), True),
        T.StructField(
            "rowDatas",
            T.ArrayType(T.StructType([T.StructField("dummy", T.IntegerType(), True)])),
            True,
        ),
    ]
)

# Canal protocol EventType enum (public alibaba/canal EntryProtocol.proto);
# the reference maps number -> name via EventType.Name
# (mon_mysql_dml.py:313-314), with the domain listed at
# mon_mysql_dml.py:175-190.
EVENT_TYPE_NAMES: dict[int, str] = {
    1: "INSERT",
    2: "UPDATE",
    3: "DELETE",
    4: "CREATE",
    5: "ALTER",
    6: "ERASE",
    7: "QUERY",
    8: "TRUNCATE",
    9: "RENAME",
    10: "CINDEX",
    11: "DINDEX",
    12: "GTID",
    13: "XACOMMIT",
    14: "XAROLLBACK",
    15: "MHEARTBEAT",
}

# Event types with is_ddl semantics (row_change.isDdl true on the wire —
# mon_mysql_dml.py:322); used by fixtures and the dim table.
DDL_EVENT_TYPES = frozenset(
    {"CREATE", "ALTER", "ERASE", "TRUNCATE", "RENAME", "CINDEX", "DINDEX", "QUERY"}
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as TIMESTAMP(NANOS) in older driver parquet; with
# spark.sql.legacy.parquet.nanosAsLong they arrive as epoch-nanos longs and
# are truncated to microseconds here — exactly what DuckDB does natively, so
# both engines see identical microsecond timestamps.
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md).

    Works on ANY SparkSession, not just the session.get_spark factory — the
    needed confs are runtime-settable and applied here on the caller's
    session (idempotent) rather than relying on factory-time configuration.
    Two generations of driver testdata are handled:

    - TIMESTAMP(NANOS) files (round <=2), which vanilla Spark rejects with
      PARQUET_TYPE_ILLEGAL: read as epoch-nanos longs (legacy conf) and
      truncated to microsecond timestamps below.
    - naive TIMESTAMP(MICROS) files (isAdjustedToUTC=false, round 3+), which
      Spark 4 reads as TIMESTAMP_NTZ by default: ``unix_millis``/``window``
      arithmetic rejects NTZ, so ``inferTimestampNTZ=false`` reads them as
      plain TIMESTAMP instead. A conf (not a per-column cast) keeps
      min/max/filter pushdown on the timestamp columns intact. Session tz is
      pinned UTC so the naive wall-clock values map to the same instants
      DuckDB's naive semantics produce, on any host.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def parquet_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — zero Spark jobs.

    ``num_rows`` is part of the parquet contract (== ``count(*)``), so
    callers that only need a corpus size for a derivation (e.g. the
    scaled IVF centroid count) can skip the driver-side ``count()`` job
    the r11 bench gate flagged at sf0.1. Handles both the single-file
    driver testdata layout and bench_replicate.py's directory layout;
    returns None for anything unreadable (callers fall back to
    ``df.count()``)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except (OSError, pa.lib.ArrowException):
        # ADVICE r13 low: catch exactly the unreadable-input classes —
        # pyarrow raises ArrowInvalid (an ArrowException, NOT an OSError)
        # on a corrupt/truncated footer, and missing/permission paths
        # raise OSError. Programming errors still propagate instead of
        # silently degrading every caller to the df.count() fallback.
        return None


def binlog_view(events: DataFrame) -> DataFrame:
    """Map the driver's generic ``events`` table onto the binlog fact schema.

    The driver testdata has no binlog-shaped table, so correctness queries run
    the reference's analytics over a deterministic column mapping (documented
    here, mirrored exactly in the DuckDB oracle SQL):

    ====================  =========================================
    binlog column          derivation from ``events``
    ====================  =========================================
    gtid                   ``concat('txn-', user_id)``
    execute_time           ``ts``
    binlog_pos             ``event_id`` (strictly increasing)
    single_statement_size  ``cast(floor(value * 100) as long)``
    affected_rows          ``cast(floor(value) as long) + 1``
    event_type             ``upper(event_type)``
    schema / table         constant 'appdb' / ``concat('t_', user_id % 4)``
    binlog_file            ``concat('mysql-bin.', user_id % 3)``
    ====================  =========================================

    ``floor`` is explicit because Spark truncates double→long while DuckDB
    rounds; both engines floor identically (IEEE doubles).
    """
    return events.select(
        F.lit("appdb").alias("schema"),
        F.concat(F.lit("t_"), (F.col("user_id") % 4).cast("string")).alias("table"),
        F.upper("event_type").alias("event_type"),
        F.lit(0).alias("is_ddl"),
        F.concat(F.lit("mysql-bin."), (F.col("user_id") % 3).cast("string")).alias(
            "binlog_file"
        ),
        F.col("event_id").alias("binlog_pos"),
        F.lit("utf8mb4").alias("characterset"),
        F.col("ts").alias("execute_time"),
        F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("gtid"),
        (F.floor(F.col("value")) + F.lit(1)).cast("long").alias(
            "single_statement_affected_rows"
        ),
        F.floor(F.col("value") * 100).cast("long").alias("single_statement_size"),
        F.col("ts").alias("ctime"),
    )


def canal_entries_view(events: DataFrame) -> DataFrame:
    """Deterministic CANAL_ENTRY_SCHEMA rows derived from ``events``.

    Stands in for decoded canal protobuf (FIXTURES.md §2) so the ingest
    transform (sources/transform.py) can be oracle-checked on driver
    testdata. Every derivation is plain arithmetic on event columns and is
    mirrored in SQL by the oracle (queries_registry).

    ~2% of rows become TRANSACTIONBEGIN entries (dropped by the transform,
    P1); eventType cycles through the full canal enum domain 1..15.
    """
    event_type_id = (F.col("event_id") % 15 + 1).cast("int")
    ddl_ids = [i for i, n in EVENT_TYPE_NAMES.items() if n in DDL_EVENT_TYPES]
    return events.select(
        F.when(F.col("event_id") % 50 == 0, "TRANSACTIONBEGIN")
        .otherwise("ROWDATA")
        .alias("entryType"),
        F.struct(
            F.lit("appdb").alias("schemaName"),
            F.concat(F.lit("t_"), (F.col("user_id") % 4).cast("string")).alias(
                "tableName"
            ),
            F.concat(F.lit("mysql-bin."), (F.col("user_id") % 3).cast("string")).alias(
                "logfileName"
            ),
            F.col("event_id").alias("logfileOffset"),
            F.lit("UTF-8").alias("serverenCode"),
            F.unix_millis(F.col("ts")).alias("executeTime"),
            F.floor(F.col("value") * 100).cast("long").alias("eventLength"),
            F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("gtid"),
            event_type_id.alias("eventType"),
        ).alias("header"),
        event_type_id.isin(ddl_ids).alias("isDdl"),
        F.array_repeat(
            F.struct(F.lit(0).alias("dummy")), (F.col("event_id") % 5 + 1).cast("int")
        ).alias("rowDatas"),
    )


# The same mapping as ANSI SQL, for composing DuckDB oracle queries.
BINLOG_VIEW_SQL = """
SELECT
  'appdb'                                         AS "schema",
  concat('t_', CAST(user_id % 4 AS VARCHAR))      AS "table",
  upper(event_type)                               AS event_type,
  0                                               AS is_ddl,
  concat('mysql-bin.', CAST(user_id % 3 AS VARCHAR)) AS binlog_file,
  event_id                                        AS binlog_pos,
  'utf8mb4'                                       AS characterset,
  ts                                              AS execute_time,
  concat('txn-', CAST(user_id AS VARCHAR))        AS gtid,
  CAST(floor(value) AS BIGINT) + 1                AS single_statement_affected_rows,
  CAST(floor(value * 100) AS BIGINT)              AS single_statement_size,
  ts                                              AS ctime
FROM events
"""
