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
