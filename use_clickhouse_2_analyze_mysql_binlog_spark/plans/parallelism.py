"""Scan-parallelism guard for CPU-heavy fan-out operators.

Parquet scans parallelize at row-group granularity. A small input file —
one row group — therefore yields ONE task, and every map-side stage built
on it (shingle explode + md5, simhash folds, k-means distance loops) runs
on a single core no matter how many the cluster has. That is exactly the
situation in which a real cluster job inserts an explicit round-robin
repartition after reading a small input it is about to fan out.

``rebalance_small_scan`` applies that pattern with a gate: it repartitions
only when the DataFrame's planned parallelism is materially below the
cluster's (< half of ``defaultParallelism``). At 100 TB the inputs arrive
in thousands of row-group splits, the gate never fires, and no exchange is
added — the helper is a no-op exactly where an unconditional repartition
would have been a catastrophic full-table shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` iff its parallelism is well below the
    cluster's. The partition count probe is driver-side planning only (file
    listing — no job runs)."""
    sc = df.sparkSession.sparkContext
    goal = target if target is not None else sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # planning failure — never block the operator
        return df
    if current * 2 <= goal:
        return df.repartition(goal)
    return df
