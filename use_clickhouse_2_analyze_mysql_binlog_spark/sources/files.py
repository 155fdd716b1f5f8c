"""File-based corpus sources: JSONL and CSV document readers.

Web-scale text corpora usually arrive as line-delimited JSON (one document
per line) or CSV drops, not parquet. These readers wrap ``spark.read`` with
the settings a production ingest needs and that are easy to get wrong:

- **Explicit schema, never inference.** Schema inference is an extra full
  pass over the data (fatal at 100 TB) and is unstable across drops (a
  batch where every ``lang`` happens to be numeric silently changes the
  column type). The documents schema is pinned here.
- **PERMISSIVE mode + corrupt-record capture.** A bad line must neither
  kill the job (FAILFAST) nor vanish silently (DROPMALFORMED): it lands in
  ``_corrupt_record`` so the pipeline can count, quarantine and replay bad
  rows. ``split_corrupt`` separates the two streams.
- **Partition-parallel by construction.** Both formats split by file and
  (for uncompressed files) by byte range; a directory of files reads with
  full cluster parallelism. Gzip is documented-unsplittable — prefer many
  medium files (or zstd parquet after the first hop).

The first thing a real pipeline does with these rows is write them back as
parquet (``plans/storage.py``) — columnar, splittable, predicate-pushdown —
so the text formats are a one-hop landing zone, not the working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents table schema (TESTDATA.md) + corrupt-record capture column
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

CORRUPT_COL = "_corrupt_record"

_WITH_CORRUPT = T.StructType(
    DOCUMENTS_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One JSON document per line -> documents rows, with malformed lines
    captured in ``_corrupt_record`` instead of dropped or fatal."""
    return (
        spark.read.schema(_WITH_CORRUPT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV drop -> documents rows; same corrupt-record contract as JSONL.
    ``multiLine`` stays off (on, files become unsplittable — one task per
    file regardless of size)."""
    return (
        spark.read.schema(_WITH_CORRUPT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true" if header else "false")
        .option("multiLine", "false")
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows): clean rows lose the capture column;
    corrupt rows keep only the raw line for quarantine/replay.

    The cache is load-bearing, not an optimization: Spark refuses queries
    that reference *only* the internal corrupt-record column of a JSON/CSV
    scan (SPARK-21610) — caching materializes the full rows first, which
    both sides then filter.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt
