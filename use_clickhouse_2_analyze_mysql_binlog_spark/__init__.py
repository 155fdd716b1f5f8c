"""PySpark-native analytics engine with the capabilities of
Fanduzi/Use_clickhouse_2_analyze_mysql_binlog.

The reference system (see /root/reference, SURVEY.md) is a MySQL-binlog CDC
analytics stack: a Kafka/canal-protobuf ingest pipeline feeding a ClickHouse
fact table, SummingMergeTree materialized-view rollups, and a periodic
5-minute-window transaction-analytics job. This package re-expresses every
capability Spark-first:

- ``session``      — tuned SparkSession factory (AQE, Arrow, UTC).
- ``schemas``      — fixed StructTypes for the binlog fact table and the
                     canal-entry wire shape; table loaders for the test data.
- ``sources``      — Kafka source config (S1–S3), canal protobuf decode
                     (S5/S6), and the ingest transform (P1–P6).
- ``operators``    — batch analytics: windowed transaction stats (A1–A4),
                     top-1-per-window (T2), daily rollups (A5/A6), summing
                     rollup semantics (A8), storage layout + retention (§1.4),
                     plus the training-data-pipeline extensions (dedup,
                     similarity search, text analysis, multimodal plumbing).
- ``streaming``    — Structured Streaming jobs: checkpointed ingest,
                     incremental rollup MV, watermarked window job.

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"
