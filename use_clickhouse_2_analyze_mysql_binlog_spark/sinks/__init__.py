from use_clickhouse_2_analyze_mysql_binlog_spark.sinks.jdbc import (  # noqa: F401
    JdbcSinkConfig,
    foreach_batch_writer,
    write_batch,
)
