#!/usr/bin/env python3
"""Dump .explain("formatted") for registry queries to plans/<outdir>/.

Usage:
  python plans/dump_plans.py OUTDIR SUFFIX [SF_DIR] [query ...]

Runs from whatever repo root is first on sys.path (so pointing
PYTHONPATH at an old worktree captures that commit's plans). Writes
OUTDIR/<query>_<SUFFIX>.txt. With no query list, dumps every registry
query.
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from use_clickhouse_2_analyze_mysql_binlog_spark import (
        queries_registry as R,
    )
    from use_clickhouse_2_analyze_mysql_binlog_spark.session import get_spark

    names = sys.argv[4:] or sorted(R.QUERIES)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = R.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001 — keep dumping the rest
            plan = f"ERROR building {name}: {ex}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            fh.write(plan)
            fh.write("\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
