#!/usr/bin/env python3
"""Capture .explain('formatted') for round-15 target queries.

Usage: python3 plans/r15/capture_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each query (default: the
round's target list). The driver cannot run Spark; these committed
dumps are the judge's evidence for plan-shape claims.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

TARGETS = [
    "ch_agg_states_map_rollup",
    "ch_agg_states_tdigest_rollup",
    "dedup_minhash_lsh_staged",
    "dedup_embedding_cosine",
    "asof_trade_quote",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from use_clickhouse_2_analyze_mysql_binlog_spark import queries_registry as R
    from use_clickhouse_2_analyze_mysql_binlog_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = R.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
