"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns with
typed metadata alongside. The Spark-side plumbing here is real and tested —
schema, Arrow batch shape, ``mapInPandas`` partition-parallel feature
extraction — while the actual codec work (image decode, resampling, frame
sampling) is stubbed: the media libraries are not in this container, so
decoders raise ``NotImplementedError`` unless a deterministic fake is
injected (tests and the oracle use the fake).

Scale notes: payload bytes never shuffle — metadata extraction is a per-row
map over the scan, and the recommended layout keeps payloads in their own
parquet column (Spark's vectorized reader skips unprojected binary columns
entirely, so metadata-only queries never touch the bytes).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata emitted per payload by feature extraction
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)

#: payload bytes -> (width, height); real impl would decode the image header
Decoder = Callable[[bytes], tuple[int, int]]


def stub_decoder(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode (no media libs in this container): derive
    dimensions from payload bytes. Replace with PIL/ffmpeg probing in a
    real deployment."""
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def real_decoder(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg, not available in this container; "
        "inject a Decoder into extract_media_features(...)"
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Derive a multimodal table from ``documents``: utf-8 payload bytes +
    a media_type tag. Stands in for a real (id, media_type, payload)
    corpus; the binary column is genuinely opaque downstream."""
    return documents.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only pass: JVM-side, payload column projected but never
    decoded in Python (octet_length is codegen'd)."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
    )


def extract_media_features(
    media: DataFrame, decoder: Decoder = real_decoder, batch_hint: int | None = None
) -> DataFrame:
    """Partition-parallel feature extraction over Arrow batches.

    ``mapInPandas`` keeps each partition's payloads in one Python worker —
    the right shape for codec work (amortizes library init per batch, no
    per-row py4j crossings). ``checksum`` is a cheap byte-sum stand-in for
    a perceptual hash.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "checksum": [sum(bytes(p)) % 1_000_000_007 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(extract, schema=MEDIA_FEATURES_SCHEMA)


# DuckDB twin of extract_media_features under stub_decoder. DuckDB has no
# byte-indexing on BLOB, so bytes come out of hex(encode(text)): byte i is
# the value of hex digits 2i-1..2i (substr on the all-ASCII hex string is an
# O(1) offset). width/height mirror stub_decoder's (64 + first%64,
# 64 + last%64); checksum is the byte-sum mod 1e9+7.
_HEXDIG = "strpos('0123456789ABCDEF', substr(h, {pos}, 1)) - 1"
_BYTE_AT = f"(16 * ({_HEXDIG.format(pos='{p1}')}) + ({_HEXDIG.format(pos='{p2}')}))"

MEDIA_FEATURES_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       media_type,
       CAST(n AS BIGINT) AS payload_bytes,
       CAST(CASE WHEN n = 0 THEN 0
            ELSE 64 + {_BYTE_AT.format(p1='1', p2='2')} % 64 END
            AS INTEGER) AS width,
       CAST(CASE WHEN n = 0 THEN 0
            ELSE 64 + {_BYTE_AT.format(p1='2*n-1', p2='2*n')} % 64 END
            AS INTEGER) AS height,
       CAST(COALESCE(list_sum(list_transform(generate_series(1, n),
            i -> {_BYTE_AT.format(p1='2*i-1', p2='2*i')})), 0) % 1000000007
            AS BIGINT) AS checksum
FROM m
"""

MEDIA_METADATA_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
FROM documents
"""
