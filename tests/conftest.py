"""Shared fixtures: one local SparkSession + a DuckDB oracle harness that
mimics the driver's compare (row-count, schema width, order-insensitive
values with columns sorted by name)."""

from __future__ import annotations

import os

import duckdb
import pytest

from use_clickhouse_2_analyze_mysql_binlog_spark import schemas
from use_clickhouse_2_analyze_mysql_binlog_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        conf={"spark.sql.shuffle.partitions": "4", "spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in schemas.TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


# the normalizer lives in the package so the analyze --check CLI applies
# the SAME contract (oracle_compare.py); re-exported here for the tests
from use_clickhouse_2_analyze_mysql_binlog_spark.oracle_compare import (  # noqa: E402,F401
    _norm_cell,
    normalize,
)


def assert_parity(spark_df, duck_con, sql: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    if not got.equals(want):
        diff = (got != want).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch, first diffs:\n"
            f"spark:\n{got[diff].head(5)}\noracle:\n{want[diff].head(5)}"
        )
