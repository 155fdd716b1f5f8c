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

from use_clickhouse_2_analyze_mysql_binlog_spark.plans.parallelism import (
    rebalance_small_scan,
)

# Rebalance width for the Python codec paths: enough workers to overlap
# codec work with the scan, few enough that Arrow batches stay large and
# the per-worker fork/init cost stays amortized (the stub decoder is
# overhead-dominated; a real codec shifts the balance toward more
# workers, which is one constant here, not a code change).
_CODEC_PARALLELISM = 8

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

    return rebalance_small_scan(media, target=_CODEC_PARALLELISM).mapInPandas(
        extract, schema=MEDIA_FEATURES_SCHEMA
    )


#: one row per sampled frame; the frame payload itself stays binary
FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_size: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling for video payloads: emit every ``stride``-th
    fixed-size frame as its own row — the 1-row-in / N-rows-out fan-out a
    real video pipeline has (ffmpeg keyframe extraction), with the decode
    stubbed as byte-slicing.

    ``mapInPandas`` is the right operator for the shape: the output
    cardinality differs from the input's (a per-row UDF cannot fan out),
    each partition's payloads stay in one Python worker (codec init
    amortized per Arrow batch), and downstream sees a normal DataFrame of
    frame rows. Payload bytes never shuffle — sampling happens on the
    scan's partitions; only the small (id, idx, stats) rows move on.
    """
    videos = media.filter(F.col("media_type") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized per payload (round 9): the per-frame Python
        # `sum(bytes)` loop dominated the isolated profile (~0.70 s at
        # sf0.1); numpy reshapes the zero-padded buffer to (n_frames,
        # frame_size) and row-sums the strided selection in C. Zero
        # padding never changes a byte sum, so checksums are identical.
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [],
                "frame_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n = len(buf)
                n_frames = (n + frame_size - 1) // frame_size
                if n_frames == 0:
                    continue
                padded = np.zeros(n_frames * frame_size, dtype=np.uint8)
                padded[:n] = np.frombuffer(buf, dtype=np.uint8)
                sel = padded.reshape(n_frames, frame_size)[::stride]
                sums = sel.sum(axis=1, dtype=np.int64) % 1_000_000_007
                idxs = range(0, n_frames, stride)
                out["doc_id"].extend([doc_id] * len(sums))
                out["frame_idx"].extend(idxs)
                out["frame_bytes"].extend(
                    min(frame_size, n - i * frame_size) for i in idxs
                )
                out["frame_checksum"].extend(sums.tolist())
            yield pd.DataFrame(out)

    return rebalance_small_scan(videos, target=_CODEC_PARALLELISM).mapInPandas(
        sample, schema=FRAME_SAMPLE_SCHEMA
    )


#: resize report: stub "resample" = keep every k-th byte of the payload
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_checksum", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame,
    max_dim: int = 32,
    decoder: Decoder = real_decoder,
) -> DataFrame:
    """Resize-to-fit report: decode dimensions, scale the longer side down
    to ``max_dim`` (aspect preserved, never upscale), and "resample" the
    payload (stub: every k-th byte where k is the linear scale factor).

    Same Arrow-batched ``mapInPandas`` shape as feature extraction; emits
    dimensions + resized checksum rather than the resized payload so the
    output is engine-comparable (a real pipeline would write the resized
    binary to a payload column instead).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                buf = bytes(payload)
                w, h = decoder(buf)
                k = max(1, (max(w, h) + max_dim - 1) // max_dim)
                tw, th = max(1, w // k) if w else 0, max(1, h // k) if h else 0
                resized = buf[::k]
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mtype)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_width"].append(tw)
                rows["target_height"].append(th)
                rows["resized_bytes"].append(len(resized))
                rows["resized_checksum"].append(sum(resized) % 1_000_000_007)
            yield pd.DataFrame(rows)

    return rebalance_small_scan(media, target=_CODEC_PARALLELISM).mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


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

def FRAME_SAMPLE_SQL(frame_size: int = 64, stride: int = 4) -> str:
    """DuckDB twin of sample_frames over the documents-derived media table
    (videos are doc_id % 3 = 2): same byte-slice frames, same checksum."""
    byte_i = _BYTE_AT.format(p1="2*i-1", p2="2*i")
    return f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id,
       CAST(idx AS INTEGER) AS frame_idx,
       CAST(least((idx + 1) * {frame_size}, n) - idx * {frame_size}
            AS BIGINT) AS frame_bytes,
       CAST(COALESCE(list_sum(list_transform(
              generate_series(idx * {frame_size} + 1,
                              least((idx + 1) * {frame_size}, n)),
              i -> {byte_i})), 0) % 1000000007 AS BIGINT) AS frame_checksum
FROM m, unnest(generate_series(0, (n + {frame_size} - 1) // {frame_size} - 1,
                               {stride})) AS t(idx)
"""


def RESIZE_SQL(max_dim: int = 32) -> str:
    """DuckDB twin of resize_media under stub_decoder: same scale factor,
    same every-k-th-byte resample, same checksum."""
    byte_i = _BYTE_AT.format(p1="2*i-1", p2="2*i")
    first = _BYTE_AT.format(p1="1", p2="2")
    last = _BYTE_AT.format(p1="2*n-1", p2="2*n")
    return f"""
WITH m0 AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
),
m AS (
  SELECT *,
         CASE WHEN n = 0 THEN 0 ELSE 64 + ({first}) % 64 END AS w,
         CASE WHEN n = 0 THEN 0 ELSE 64 + ({last}) % 64 END AS hgt
  FROM m0
),
s AS (
  SELECT *,
         CASE WHEN greatest(w, hgt) = 0 THEN 1
              ELSE (greatest(w, hgt) + {max_dim} - 1) // {max_dim} END AS k
  FROM m
)
SELECT doc_id, media_type,
       CAST(w AS INTEGER) AS width,
       CAST(hgt AS INTEGER) AS height,
       CAST(CASE WHEN w = 0 THEN 0 ELSE greatest(1, w // k) END
            AS INTEGER) AS target_width,
       CAST(CASE WHEN hgt = 0 THEN 0 ELSE greatest(1, hgt // k) END
            AS INTEGER) AS target_height,
       CAST((n + k - 1) // k AS BIGINT) AS resized_bytes,
       CAST(COALESCE(list_sum(list_transform(
              generate_series(1, n, CAST(k AS INTEGER)),
              i -> {byte_i})), 0) % 1000000007 AS BIGINT) AS resized_checksum
FROM s
"""


MEDIA_METADATA_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
FROM documents
"""
