"""Skew-mitigation join: key salting.

The binlog fact table is skewed by construction on low-cardinality keys —
``table`` has 4 values, ``schema`` has 1 (``/root/reference/README.md:
99-118``); a shuffle join on such a key sends everything to a handful of
reducers. The mitigation ladder at 100 TB:

1. **Broadcast** the small side (first choice; Spark does it under the
   threshold, and AQE upgrades to it at runtime when post-filter stats
   allow).
2. **AQE skew-join splitting** (`spark.sql.adaptive.skewJoin.enabled`, on
   in session.py) — splits oversized shuffle partitions automatically.
3. **Salting** (this module) — when both sides are too big to broadcast
   and the skew is in the *key distribution* rather than partition sizing:
   replicate each small-side row ``num_salts`` times, scatter the big side
   by a deterministic salt, join on (key, salt). Shuffle spreads over
   ``keys × num_salts`` reducer groups at the cost of replicating the
   small side ``num_salts``×.

Salting is exact (no semantics change): every fact row meets exactly one
replica of its key's dim row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``dim`` on ``key`` with ``num_salts``-way salting.

    ``salt_source`` must be a deterministic fact-side expression (e.g. a
    position or id column) — ``rand()`` would also work operationally but
    breaks re-runs/retries being bit-identical.
    """
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    salted_facts = facts.withColumn(
        "__salt", F.pmod(salt_source, F.lit(num_salts)).cast("int")
    )
    return salted_facts.join(salted_dim, [key, "__salt"], how).drop("__salt")


def table_profile_salted(binlog: DataFrame, num_salts: int = 16) -> DataFrame:
    """Enrich facts with a per-table profile dim via salted join, then
    aggregate — the 4-value ``table`` key is maximally skewed, the shape
    salting exists for."""
    dim = binlog.groupBy("table").agg(
        F.count(F.lit(1)).alias("table_rows"),
        F.sum("single_statement_size").alias("table_size"),
    )
    joined = salted_join(
        binlog.select("table", "event_type", "single_statement_size"),
        dim,
        key="table",
        salt_source=F.col("single_statement_size"),
        num_salts=num_salts,
    )
    return joined.groupBy("table", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("table_rows").alias("table_rows"),
        F.max("table_size").alias("table_size"),
    )


def TABLE_PROFILE_SALTED_SQL(binlog_sql: str) -> str:
    # salting is invisible to semantics: the oracle is the plain join
    return f"""
WITH binlog AS ({binlog_sql}),
dim AS (
  SELECT "table", count(*) AS table_rows,
         CAST(sum(single_statement_size) AS BIGINT) AS table_size
  FROM binlog GROUP BY 1
)
SELECT b."table", b.event_type, count(*) AS n_events,
       max(d.table_rows) AS table_rows, max(d.table_size) AS table_size
FROM binlog b JOIN dim d ON b."table" = d."table"
GROUP BY 1, 2
"""
