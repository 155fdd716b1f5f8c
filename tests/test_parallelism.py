"""The rebalance gate must fire only on under-parallel inputs: at scale
(many splits) it is an identity — the whole point of the guard."""

from use_clickhouse_2_analyze_mysql_binlog_spark.plans.parallelism import (
    rebalance_small_scan,
)


def test_single_partition_input_rebalances(spark):
    df = spark.range(0, 1000).coalesce(1)
    out = rebalance_small_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_wide_input_untouched(spark):
    wide = spark.range(0, 1000).repartition(
        spark.sparkContext.defaultParallelism
    )
    # identity object, not merely same partition count: no exchange added
    assert rebalance_small_scan(wide) is wide


def test_explicit_target_respected(spark):
    df = spark.range(0, 100).coalesce(1)
    assert rebalance_small_scan(df, target=4).rdd.getNumPartitions() == 4


def test_single_row_group_parquet_rebalances(spark, tmp_path):
    """r14: planned byte-range splits OVERCOUNT a parquet scan's true
    parallelism — a single-row-group file is read by one task however
    many splits Spark plans over it. The gate must consult footers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "one_group.parquet")
    # one file, ONE row group, but big enough that Spark plans many
    # byte-range splits (maxSplitBytes = max(4MB, size/parallelism))
    n = 600_000
    pq.write_table(
        pa.table({"id": list(range(n)), "pad": ["x" * 64] * n}),
        path,
        row_group_size=n,
    )
    df = spark.read.parquet(path)
    planned = df.rdd.getNumPartitions()
    goal = spark.sparkContext.defaultParallelism
    if planned * 2 > goal:  # the case the r14 fix exists for
        out = rebalance_small_scan(df)
        assert out is not df, (
            f"planned={planned} splits over 1 row group must rebalance"
        )
        assert out.rdd.getNumPartitions() == goal


def test_many_row_group_parquet_untouched(spark, tmp_path):
    """A genuinely splittable parquet input (row groups >= half the
    cluster) stays untouched even when footers are consulted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    goal = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many_groups.parquet")
    n = 600_000
    pq.write_table(
        pa.table({"id": list(range(n)), "pad": ["x" * 64] * n}),
        path,
        row_group_size=max(1, n // (goal * 2)),
    )
    df = spark.read.parquet(path)
    if df.rdd.getNumPartitions() * 2 > goal:
        assert rebalance_small_scan(df) is df
