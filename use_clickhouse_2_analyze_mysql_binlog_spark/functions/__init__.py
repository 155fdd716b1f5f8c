"""Engine-portable scalar helpers shared by operators and their oracles."""

from use_clickhouse_2_analyze_mysql_binlog_spark.functions.portable import (  # noqa: F401
    HASH31_SQL,
    HASH60_SQL,
    MINHASH_PRIME,
    hash31,
    hash60,
)
