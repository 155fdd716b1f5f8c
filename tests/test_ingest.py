"""Ingest path unit tests: canal decode fallback, transform semantics,
Kafka source config mapping (SURVEY.md §2.1-2.2)."""

import json

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from use_clickhouse_2_analyze_mysql_binlog_spark.schemas import (
    BINLOG_EVENT_SCHEMA,
    canal_entries_view,
    load_table,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.sources import (
    canal,
    canal_wire,
    kafka,
    transform,
)
from tests.conftest import SF_DIR


def _header(**kw):
    base = dict(
        schemaName="db1",
        tableName="t1",
        logfileName="mysql-bin.000001",
        logfileOffset=100,
        serverenCode="UTF-8",
        executeTime=1704067200000,
        eventLength=593,
        gtid="uuid:1-1",
        eventType=1,
    )
    base.update(kw)
    return base


def test_transform_drops_begin_and_maps_fields(spark):
    entries = spark.createDataFrame(
        [
            Row(entryType="TRANSACTIONBEGIN", header=_header(), isDdl=False,
                rowDatas=[]),
            Row(entryType="ROWDATA", header=_header(eventType=2, logfileOffset=171),
                isDdl=False, rowDatas=[{"dummy": 0}, {"dummy": 0}]),
            Row(entryType="ROWDATA", header=_header(eventType=5, logfileOffset=242),
                isDdl=True, rowDatas=[]),
        ],
        schema=canal.CANAL_ENTRY_SCHEMA,
    )
    out = transform.canal_entries_to_binlog(
        entries, ctime=F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    )
    # names+types match the declared fact schema (nullability is not
    # preserved through expressions; the sink enforces it)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in BINLOG_EVENT_SCHEMA.fields
    ]
    rows = {r.binlog_pos: r for r in out.collect()}
    assert set(rows) == {171, 242}  # BEGIN dropped (P1)
    assert rows[171].event_type == "UPDATE"  # P6 enum decode
    assert rows[171].single_statement_affected_rows == 2  # P5 len(rowDatas)
    assert rows[171].is_ddl == 0 and rows[242].is_ddl == 1  # P4
    assert str(rows[171].execute_time) == "2024-01-01 00:00:00"  # F8 epoch ms


def test_transform_unknown_enum(spark):
    entries = spark.createDataFrame(
        [Row(entryType="ROWDATA", header=_header(eventType=99), isDdl=False,
             rowDatas=[])],
        schema=canal.CANAL_ENTRY_SCHEMA,
    )
    out = transform.canal_entries_to_binlog(entries).collect()
    assert out[0].event_type == "UNKNOWN_99"


def test_decode_packets_with_fake_parser(spark):
    """S5/S6 via the mapInPandas fallback with an injected parser."""

    def parser(raw: bytes):
        # self-contained: runs on executors, must not reference test module
        n = int(raw.decode())
        return [
            {
                "entryType": "ROWDATA",
                "header": {
                    "schemaName": "db1",
                    "tableName": "t1",
                    "logfileName": "mysql-bin.000001",
                    "logfileOffset": i,
                    "serverenCode": "UTF-8",
                    "executeTime": 1704067200000,
                    "eventLength": 593,
                    "gtid": f"uuid:1-{n}",
                    "eventType": 1,
                },
                "isDdl": False,
                "rowDatas": [{"dummy": 0}] * (i + 1),
            }
            for i in range(n)
        ]

    raw = spark.createDataFrame(
        [(b"2",), (b"3",)], "value binary"
    )
    decoded = canal.decode_packets_with(raw, parser)
    assert decoded.schema == canal.CANAL_ENTRY_SCHEMA
    assert decoded.count() == 5
    out = transform.canal_entries_to_binlog(decoded)
    assert out.groupBy("gtid").count().count() == 2


def _wire_packet() -> bytes:
    """One canal Packet: BEGIN + two ROWDATA (one DDL) + END, real wire bytes."""
    h = dict(
        schema_name="db1",
        table_name="t1",
        logfile_name="mysql-bin.000001",
        serveren_code="UTF-8",
        execute_time=1704067200000,
        event_length=593,
        gtid="uuid:1-7",
    )
    entries = [
        canal_wire.encode_entry(
            "TRANSACTIONBEGIN", canal_wire.encode_header(**h, logfile_offset=4)
        ),
        canal_wire.encode_entry(
            "ROWDATA",
            canal_wire.encode_header(**h, logfile_offset=259, event_type=1),
            canal_wire.encode_row_change(n_row_datas=2),
        ),
        canal_wire.encode_entry(
            "ROWDATA",
            canal_wire.encode_header(**h, logfile_offset=852, event_type=9),
            canal_wire.encode_row_change(is_ddl=True),
        ),
        canal_wire.encode_entry(
            "TRANSACTIONEND", canal_wire.encode_header(**h, logfile_offset=921)
        ),
    ]
    return canal_wire.encode_packet(entries)


def test_wire_codec_roundtrip():
    """S5/S6: the pure-Python wire codec round-trips the canal protocol."""
    parsed = canal_wire.parse_packet_wire(_wire_packet())
    assert [e["entryType"] for e in parsed] == [
        "TRANSACTIONBEGIN", "ROWDATA", "ROWDATA", "TRANSACTIONEND",
    ]
    assert parsed[1]["header"]["schemaName"] == "db1"
    assert parsed[1]["header"]["tableName"] == "t1"
    assert parsed[1]["header"]["logfileOffset"] == 259
    assert parsed[1]["header"]["executeTime"] == 1704067200000
    assert parsed[1]["header"]["gtid"] == "uuid:1-7"
    assert parsed[1]["header"]["eventType"] == 1
    assert len(parsed[1]["rowDatas"]) == 2 and not parsed[1]["isDdl"]
    assert parsed[2]["isDdl"] and parsed[2]["header"]["eventType"] == 9
    # proto3 absent fields decode to the pb2 defaults
    assert parsed[0]["header"]["eventType"] == 0
    assert parsed[0]["rowDatas"] == []


def test_wire_codec_golden_bytes():
    """Pin the decoder to the documented encoding, not just to the encoder:
    hand-assembled bytes per the protobuf wire spec + public canal field
    numbers (Entry{header=1,entryType=2,storeValue=3}; Header{schemaName=8,
    gtid=13}; RowChange{isDdl=10}; Messages{messages=2}; Packet{body=5})."""
    header = b"\x42\x03db1" + b"\x6a\x08uuid:1-1"  # field8 str, field13 str
    row_change = b"\x50\x01"  # field 10 varint 1 (isDdl=true)
    entry = (
        b"\x0a" + bytes([len(header)]) + header  # field 1 len-delim
        + b"\x10\x02"  # field 2 varint 2 (ROWDATA)
        + b"\x1a" + bytes([len(row_change)]) + row_change  # field 3
    )
    messages = b"\x12" + bytes([len(entry)]) + entry  # Messages.messages=2
    packet = b"\x2a" + bytes([len(messages)]) + messages  # Packet.body=5
    [e] = canal_wire.parse_packet_wire(packet)
    assert e["entryType"] == "ROWDATA"
    assert e["header"]["schemaName"] == "db1"
    assert e["header"]["gtid"] == "uuid:1-1"
    assert e["isDdl"] is True


def test_wire_codec_negative_int64_and_truncation():
    # int64 negatives ride as 10-byte two's-complement varints
    h = canal_wire.encode_header(execute_time=-5, logfile_offset=7)
    fd = canal_wire.fields_dict(h)
    assert canal_wire._i64(fd, canal_wire.HEADER_EXECUTE_TIME) == -5
    with pytest.raises(ValueError, match="truncated"):
        canal_wire.fields_dict(b"\x0a\xff")


def test_decode_packets_wire_fallback_e2e(spark):
    """decode_packets works with NO pb2 modules: wire codec inside
    mapInPandas, then the standard transform — the full S5/S6 -> P1-P6
    path on real wire bytes."""
    raw = spark.createDataFrame([(_wire_packet(),)], "value binary")
    decoded = canal.decode_packets(raw)
    assert decoded.schema == canal.CANAL_ENTRY_SCHEMA
    out = transform.canal_entries_to_binlog(decoded).collect()
    # P1 drops TRANSACTIONBEGIN only (mon_mysql_dml.py:252-253): the two
    # ROWDATA entries and the TRANSACTIONEND survive
    assert len(out) == 3
    assert [r.event_type for r in out] == ["INSERT", "RENAME", "UNKNOWN_0"]
    assert [r.is_ddl for r in out] == [0, 1, 0]
    assert all(r.gtid == "uuid:1-7" for r in out)


def test_canal_entries_view_matches_schema(spark):
    entries = canal_entries_view(load_table(spark, SF_DIR, "events"))
    assert entries.schema.simpleString() == canal.CANAL_ENTRY_SCHEMA.simpleString()
    kinds = {r.entryType for r in entries.select("entryType").distinct().collect()}
    assert kinds == {"ROWDATA", "TRANSACTIONBEGIN"}


def test_kafka_reader_options():
    cfg = kafka.KafkaSourceConfig(
        bootstrap_servers="h1:9092,h2:9092",
        topic="binlog",
        partition=0,
        offset_mode="beginning",
        sasl_username="user",
        sasl_password="pw",
    )
    opts = cfg.reader_options()
    assert json.loads(opts["assign"]) == {"binlog": [0]}  # S2 manual assign
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "5000"  # W4 batch bound
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"  # S3
    # stored mode resumes from checkpoint: no startingOffsets override
    stored = kafka.KafkaSourceConfig(
        bootstrap_servers="h", topic="t", offset_mode="stored", partition=None
    ).reader_options()
    assert "startingOffsets" not in stored
    assert stored["subscribe"] == "t"


def test_wire_codec_is_primary_decode_path():
    """VERDICT r04 #2: the from_protobuf path was removed because the
    spark-protobuf jar is absent (PROTOBUF_NOT_LOADED). The wire codec is
    the documented-primary path; if the jar ever appears in this
    environment, this canary fails to flag that the JVM path should be
    reinstated and e2e-tested against the wire codec."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources import canal

    assert not hasattr(canal, "decode_packets_protobuf")
    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
        import importlib.util

        jvm_side_available = False  # python wrapper exists; jar decides
        import pyspark, os

        jars = os.listdir(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
        jvm_side_available = any(
            j.startswith("spark-protobuf") for j in jars
        )
    except ImportError:
        jvm_side_available = False
    assert not jvm_side_available, (
        "spark-protobuf jar is now present: reinstate the from_protobuf "
        "decode chain (see sources/canal.py NOTE) and e2e-test it"
    )


def test_jdbc_sink_config_and_idempotent_writer(spark):
    from use_clickhouse_2_analyze_mysql_binlog_spark.sinks import (
        JdbcSinkConfig,
        foreach_batch_writer,
    )

    cfg = JdbcSinkConfig(
        url="jdbc:clickhouse://h1:8123,h2:8123/mysql_monitor",
        table="largest_transaction_local",
        user="writer",
        batch_size=5000,
    )
    assert cfg.properties()["batchsize"] == "5000"
    assert cfg.properties()["user"] == "writer"

    written = []

    def fake_writer(df, _cfg):
        written.extend(sorted(r["end_time"] for r in df.collect()))

    batch = spark.createDataFrame(
        [("t1", 1), ("t2", 2), ("t3", 3)], "end_time string, v int"
    )
    # sink already holds t1/t3 -> only t2 may be written (S11 guard)
    existing = spark.createDataFrame([("t1",), ("t3",)], "end_time string")
    publish = foreach_batch_writer(
        cfg,
        dedup_keys=["end_time"],
        existing_keys=lambda b: existing,
        writer=fake_writer,
    )
    publish(batch, 0)
    assert written == ["t2"]
    # replayed epoch against a sink now containing everything -> no write
    written.clear()
    publish2 = foreach_batch_writer(
        cfg,
        dedup_keys=["end_time"],
        existing_keys=lambda b: batch.select("end_time"),
        writer=fake_writer,
    )
    publish2(batch, 0)
    assert written == []


def test_jsonl_source_corrupt_record_capture(spark, tmp_path):
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources import files

    p = tmp_path / "drop.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s", "n_chars": 7}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
    )
    clean, corrupt = files.split_corrupt(
        files.read_documents_jsonl(spark, str(p))
    )
    assert {r.doc_id for r in clean.collect()} == {1, 2, 3}
    assert files.CORRUPT_COL not in clean.columns
    bad = corrupt.collect()
    assert len(bad) == 1 and "not json" in bad[0][files.CORRUPT_COL]


def test_csv_source_corrupt_record_capture(spark, tmp_path):
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources import files

    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,s,5\n"
        "2,salut,fr,s,5\n"
        "not_a_number,oops,en,s,xyz\n"
    )
    clean, corrupt = files.split_corrupt(files.read_documents_csv(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert corrupt.count() == 1


def test_jdbc_source_partitioned_read_options():
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources.jdbc import (
        JdbcSourceConfig,
    )

    cfg = JdbcSourceConfig(
        url="jdbc:mysql://h1:3306/appdb",
        table="broker_binlog",
        user="u",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    opts = cfg.reader_options()
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"

    with pytest.raises(ValueError, match="needs"):
        JdbcSourceConfig(
            url="u", table="t", partition_column="id"
        ).reader_options()
    with pytest.raises(ValueError, match="not both"):
        JdbcSourceConfig(
            url="u", table="t", partition_column="id", lower_bound=0,
            upper_bound=1, num_partitions=2, predicates=["day = '2020-01-01'"],
        ).reader_options()

    per_day = JdbcSourceConfig(
        url="u", table="t", predicates=[f"day = '2020-01-{d:02d}'" for d in range(1, 31)]
    )
    assert "partitionColumn" not in per_day.reader_options()


def test_decode_packets_routed(spark):
    """on_error='route': a poison packet becomes ONE dead-letterable row
    (error text + verbatim bytes) instead of a forever-retried task
    failure; good packets decode identically to the fail path."""
    garbage = b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff"
    raw = spark.createDataFrame(
        [(_wire_packet(),), (garbage,)], "value binary"
    )
    routed = canal.decode_packets(raw, on_error="route")
    assert routed.schema == canal.ROUTED_ENTRY_SCHEMA
    rows = routed.collect()
    good = [r for r in rows if r._decode_error is None]
    bad = [r for r in rows if r._decode_error is not None]
    assert len(good) == 4 and len(bad) == 1  # 4 entries in _wire_packet
    assert bytes(bad[0]._raw) == garbage
    assert "ValueError" in bad[0]._decode_error
    assert all(r._raw is None for r in good)
    # entry content identical to the fail-path decode
    plain = canal.decode_packets(
        spark.createDataFrame([(_wire_packet(),)], "value binary")
    ).collect()
    assert [r.entryType for r in good] == [r.entryType for r in plain]

    # default fail mode: the poison packet kills the job (documented)
    with pytest.raises(Exception):
        canal.decode_packets(raw).collect()

    with pytest.raises(ValueError):
        canal.decode_packets(raw, on_error="ignore")


def test_ingest_stream_dead_letter_route(spark, tmp_path):
    """E2E poison-message drain: raw Kafka-shaped bytes -> routed decode
    -> ingest with dead_letter_path. The good packet's rows land in the
    fact sink, the poison packet lands in the DLQ with its bytes intact,
    and a checkpoint replay duplicates neither."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import ingest_job

    garbage = b"\x00not-a-canal-packet"
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(_wire_packet(),), (garbage,)], "value binary"
    ).write.parquet(src)
    sink = str(tmp_path / "fact")
    dlq = str(tmp_path / "dead")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("value binary").parquet(src)
        )
        q = ingest_job.run_ingest_stream(
            canal.decode_packets(stream, on_error="route"),
            sink,
            ckpt,
            available_now=True,
            dead_letter_path=dlq,
        )
        q.awaitTermination(120)

    run()
    fact = spark.read.parquet(sink)
    # the good packet contributes its 3 post-transform rows (see
    # test_decode_packets_wire_fallback_e2e); the poison packet none
    assert fact.count() == 3
    dead = spark.read.parquet(dlq).collect()
    assert len(dead) == 1
    assert bytes(dead[0]._raw) == garbage
    assert dead[0]._decode_error

    # replay from checkpoint: no new data -> no dups on either sink
    run()
    assert spark.read.parquet(sink).count() == 3
    assert spark.read.parquet(dlq).count() == 1


def test_dlq_replay(spark, tmp_path):
    """After a decoder fix the operator replays the DLQ: recoverable
    packets land in the fact table, unrecoverable ones are counted (and
    optionally requeued); the source DLQ is never mutated."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import ingest_job

    garbage = b"\x01still broken"
    dlq = str(tmp_path / "dlq")
    # a DLQ as the routed ingest writes it: error text + verbatim bytes
    spark.createDataFrame(
        [("E1", _wire_packet()), ("E2", garbage)],
        "_decode_error string, _raw binary",
    ).write.parquet(dlq)
    sink = str(tmp_path / "fact")

    n_ok, n_bad = ingest_job.replay_dead_letters(
        spark, dlq, sink, requeue_path=str(tmp_path / "requeue")
    )
    assert (n_ok, n_bad) == (3, 1)  # _wire_packet -> 3 post-transform rows
    assert spark.read.parquet(sink).count() == 3
    requeued = spark.read.parquet(str(tmp_path / "requeue")).collect()
    assert len(requeued) == 1 and bytes(requeued[0]._raw) == garbage
    # source DLQ untouched (audit trail; archiving is the operator's step)
    assert spark.read.parquet(dlq).count() == 2

    from use_clickhouse_2_analyze_mysql_binlog_spark import cli

    rc = cli.main([
        "dlq-replay", "--dead-letter", dlq, "--sink", str(tmp_path / "fact2"),
    ])
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "fact2")).count() == 3


def test_ingest_routed_stream_without_dlq_is_loud(spark, tmp_path):
    """Loud-or-routed contract (ADVICE r07 #1): a stream carrying routed
    decode errors ('_decode_error' column) MUST have a dead_letter_path —
    without one the all-NULL poison rows would be silently discarded by
    the TRANSACTIONBEGIN filter, losing both the data and the error."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import ingest_job

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(_wire_packet(),)], "value binary"
    ).write.parquet(src)
    stream = spark.readStream.schema("value binary").parquet(src)
    routed = canal.decode_packets(stream, on_error="route")
    with pytest.raises(ValueError, match="dead_letter_path"):
        ingest_job.run_ingest_stream(
            routed,
            str(tmp_path / "fact"),
            str(tmp_path / "ckpt"),
            available_now=True,
        )
