"""Streaming corpus curation: the batch curation pipeline (operators/
curation.py) run continuously over a document stream.

quality gate (row-local, fuses into the source scan) -> exact dedup via
``dropDuplicatesWithinWatermark`` on the content hash (state bounded by the
watermark horizon — the streaming analogue of the batch keep-first window;
the survivor is the FIRST ARRIVAL rather than the min doc_id, the natural
streaming policy) -> PII scrub (row-local) -> native parquet streaming sink
(exactly-once via its ``_spark_metadata`` log).

At 100 TB/day the state is one 60-bit hash + timestamp per surviving
document inside the horizon — gigabytes, not the corpus: the horizon is the
dedup window, and cross-horizon exact dedup belongs to the batch operator
over the materialized corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from use_clickhouse_2_analyze_mysql_binlog_spark.functions import hash60
from use_clickhouse_2_analyze_mysql_binlog_spark.operators.curation import (
    PII_PATTERNS,
)
from use_clickhouse_2_analyze_mysql_binlog_spark.operators.text import with_quality


def curate_stream(
    doc_stream: DataFrame,
    min_quality: float = 0.55,
    min_tokens: int = 8,
    allowed_lateness: str = "10 minutes",
    scrub: bool = True,
    time_col: str = "ingest_time",
) -> DataFrame:
    """Quality-gate, dedup and scrub a document stream (must carry an
    event-time ``time_col`` for the dedup watermark)."""
    gated = with_quality(doc_stream).filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    deduped = (
        gated.withColumn("content_hash", hash60(F.col("text")))
        .withWatermark(time_col, allowed_lateness)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    text_col = F.col("text")
    if scrub:
        for pat, repl in PII_PATTERNS:
            text_col = F.regexp_replace(text_col, pat, repl)
    return deduped.select(
        "doc_id",
        "lang",
        "source",
        text_col.alias("text"),
        "n_tokens",
        "quality_score",
    )


def run_curate_stream(
    doc_stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    min_quality: float = 0.55,
    min_tokens: int = 8,
    allowed_lateness: str = "10 minutes",
    available_now: bool = False,
) -> StreamingQuery:
    writer = (
        curate_stream(
            doc_stream,
            min_quality=min_quality,
            min_tokens=min_tokens,
            allowed_lateness=allowed_lateness,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
