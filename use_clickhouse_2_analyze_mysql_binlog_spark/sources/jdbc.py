"""Partitioned JDBC source: parallel backfill reads from an RDBMS.

The reference's pipeline is binlog-driven (canal -> Kafka); the missing
piece for a fresh deployment is the initial backfill of history already in
MySQL. A naive ``spark.read.jdbc(url, table)`` is a SINGLE connection
pulling the whole table through one task — at backfill scale the read must
be partitioned, which is pure configuration that is easy to get wrong:

- **range mode**: ``partitionColumn/lowerBound/upperBound/numPartitions``
  splits the key range into numPartitions WHERE-clause slices, one
  connection each. Bounds do NOT filter — rows outside land in the first/
  last slice; a skewed key range makes skewed slices.
- **predicate mode**: one explicit WHERE clause per partition — the
  escape hatch for non-numeric or skewed keys (e.g. one predicate per day
  or per hash bucket).
- ``fetchsize`` controls rows per round trip (MySQL needs it to stream at
  all; the driver otherwise buffers the whole result set).

No database/driver exists in the test environment, so (same contract as
sinks/jdbc.py) the option-building logic is the tested surface and the
actual ``spark.read`` call is exercised only in deployments.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSourceConfig:
    url: str  # e.g. jdbc:mysql://h1:3306/appdb
    table: str  # table name or "(subquery) alias"
    user: str | None = None
    password: str | None = None
    driver: str | None = None  # e.g. com.mysql.cj.jdbc.Driver
    # range-partitioned read (all four set together)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    # OR explicit per-partition predicates (mutually exclusive with range)
    predicates: list[str] | None = None
    fetch_size: int = 10_000
    extra: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        if self.predicates is not None and self.partition_column is not None:
            raise ValueError(
                "use either range partitioning or explicit predicates, not both"
            )
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        if self.partition_column is not None:
            missing = [
                k
                for k, v in (
                    ("lowerBound", self.lower_bound),
                    ("upperBound", self.upper_bound),
                    ("numPartitions", self.num_partitions),
                )
                if v is None
            ]
            if missing:
                raise ValueError(
                    f"range-partitioned read needs {missing} alongside "
                    "partition_column"
                )
            opts["partitionColumn"] = self.partition_column
            opts["lowerBound"] = str(self.lower_bound)
            opts["upperBound"] = str(self.upper_bound)
            opts["numPartitions"] = str(self.num_partitions)
        opts.update(self.extra)
        return opts


def read_table(spark: SparkSession, config: JdbcSourceConfig) -> DataFrame:
    """Partitioned JDBC read. Predicate mode routes through the
    ``predicates`` overload (one partition per WHERE clause)."""
    if config.predicates is not None:
        props = {
            k: v
            for k, v in config.reader_options().items()
            if k not in ("url", "dbtable")
        }
        return spark.read.jdbc(
            config.url, config.table, predicates=config.predicates, properties=props
        )
    return spark.read.format("jdbc").options(**config.reader_options()).load()
