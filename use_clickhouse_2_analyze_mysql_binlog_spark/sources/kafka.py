"""Kafka source for the canal-protobuf binlog stream (S1-S4, SURVEY.md §2.1).

The reference consumes one topic-partition with confluent-kafka
(``/root/reference/mon_mysql_dml.py:99-147``): manual partition assign with
four offset modes (``:115-125``), optional SCRAM-SHA-256 SASL (``:108-112``),
batch polls of 100 (``:129-142``). In Structured Streaming:

- offset modes  -> ``startingOffsets`` (``earliest``/``latest``/JSON per
  partition); the reference's "stored" mode is the checkpoint resume.
- batch size    -> ``maxOffsetsPerTrigger`` (bounds each micro-batch; the
  analogue of the reference's 5000-row flush, W4).
- commit errors -> obsolete: offsets live in the checkpoint, atomically with
  the sink epoch (fixes the reference's at-most-once gap, SURVEY.md §3-E1).

No broker exists in the test environment, so this module only *builds* the
reader; tests assert the option set, and the streaming jobs accept any
source DataFrame (file/rate/memory stand-ins — SURVEY.md §7 Phase 2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: reference offset flags (mon_mysql_dml.py:65-68) -> startingOffsets
OFFSET_MODES = {
    "beginning": "earliest",
    "end": "latest",
    "stored": None,  # resume from checkpoint (Spark's default behavior)
    "invalid": "latest",  # reference treats invalid as auto-reset
}


@dataclass
class KafkaSourceConfig:
    """Mirrors the reference's consumer surface (mon_mysql_dml.py:8-34)."""

    bootstrap_servers: str
    topic: str
    partition: int | None = 0
    offset_mode: str = "end"
    group_id: str = "binlog_spark"
    sasl_username: str | None = None
    sasl_password: str | None = None
    max_offsets_per_trigger: int | None = 5000
    extra: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            # fetch.wait.max.ms analogue (mon_mysql_dml.py:104)
            "kafka.fetch.max.wait.ms": "3000",
            "failOnDataLoss": "false",
        }
        if self.partition is None:
            opts["subscribe"] = self.topic
        else:
            # manual single-partition assign (mon_mysql_dml.py:115-125)
            opts["assign"] = json.dumps({self.topic: [self.partition]})
        starting = OFFSET_MODES.get(self.offset_mode)
        if starting is not None:
            opts["startingOffsets"] = starting
        if self.max_offsets_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.sasl_username:
            # SCRAM over SASL_PLAINTEXT (mon_mysql_dml.py:108-112)
            opts["kafka.security.protocol"] = "SASL_PLAINTEXT"
            opts["kafka.sasl.mechanism"] = "SCRAM-SHA-256"
            opts["kafka.sasl.jaas.config"] = (
                "org.apache.kafka.common.security.scram.ScramLoginModule "
                f'required username="{self.sasl_username}" '
                f'password="{self.sasl_password or ""}";'
            )
        opts.update(self.extra)
        return opts


def read_stream(spark: SparkSession, config: KafkaSourceConfig) -> DataFrame:
    """``readStream.format("kafka")`` with the mapped option set."""
    reader = spark.readStream.format("kafka")
    for k, v in config.reader_options().items():
        reader = reader.option(k, v)
    return reader.load()
