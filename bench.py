#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the HEADLINE query set — the five
reference-core transaction-analytics queries — so the metric stays
comparable across rounds as more operators join the registry. Every
registered query is still timed individually under ``queries`` and summed
under ``total_all_queries``. Each query executes fully (count) so lazy
plans can't cheat.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "transaction_stats",
    "top_transaction_by_size",
    "top_transaction_by_spend_time",
    "top_transaction_by_affected_rows",
    "transaction_result_table",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from use_clickhouse_2_analyze_mysql_binlog_spark import queries_registry as R
    from use_clickhouse_2_analyze_mysql_binlog_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footer caches with an unrelated action
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    names = [n for n in BENCH_QUERIES if n in R.QUERIES]
    names += [n for n in sorted(R.QUERIES) if n not in names]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        R.QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(
                    sum(timings[n] for n in BENCH_QUERIES if n in timings), 3
                ),
                "unit": "sec",
                "queries": timings,
                "total_all_queries": round(sum(timings.values()), 3),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
