"""General analytical queries over the star schema (joins + wide aggs).

The reference contains no joins (SURVEY.md §2.3); these TPC-H-shaped
queries exercise the engine paths a general analytics workload needs —
multi-way joins, semi-joins, wide aggregations, top-k over joins — and
anchor the benchmark beyond the binlog surface.

Scale design notes:
- money math is done in DECIMAL(18,2/4): decimal sums are exact and
  order-independent, so results are deterministic across engines and
  across any degree of parallelism (double sums are neither).
- dimension joins (region/nation, and customer at small SF) broadcast;
  fact-fact joins (orders-lineitem) shuffle on the join key — at 100 TB
  both sides would be bucketed by orderkey to make this a zero-shuffle
  sort-merge join.
- top-k over aggregates compiles to TakeOrderedAndProject (no global
  sort).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_FMT = "yyyy-MM-dd"


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over lineitem below a ship-date
    cutoff. Fully map-side-combinable: 4-ish groups."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    # scale 6: the true product has exactly 6 decimal digits (2+2+2), so
    # the cast never rounds — scale 4 hit HALF_UP-vs-half-even boundary
    # divergence between Spark and the oracle on ~1% of rows
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(dec("l_quantity")) / F.count(F.lit(1)), 4)
            .cast("double")
            .alias("avg_qty"),
            F.round(F.sum(dec("l_extendedprice")) / F.count(F.lit(1)), 4)
            .cast("double")
            .alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def PRICING_SUMMARY_SQL(cutoff: str = "1998-09-02") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*), 4)
            AS DOUBLE) AS avg_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / count(*), 4)
            AS DOUBLE) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY 1, 2
"""


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, revenue per order, top-k.

    Customer (filtered) broadcasts at test SF; orders-lineitem shuffles on
    orderkey. Deterministic ordering: revenue desc then orderkey asc.
    """
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    cut = F.lit(cutoff).cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cut)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", DAY_FMT).alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def TOP_REVENUE_ORDERS_SQL(
    segment: str = "BUILDING", cutoff: str = "1998-01-01", k: int = 10
) -> str:
    return f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {k}
"""


def nation_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, revenue by nation within a region for
    one year. The dim chain (region->nation->supplier) broadcasts."""
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    dims = F.broadcast(
        region.filter(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("o_orderdate") == year)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        # TPC-H Q5's local-supplier condition: both parties in the region,
        # same nation
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def NATION_REVENUE_SQL(region_name: str = "EUROPE", year: int = 1997) -> str:
    return f"""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{region_name}'
  AND year(o_orderdate) = {year}
  AND c_nationkey = s_nationkey
GROUP BY 1
"""


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame, year: int = 1997
) -> DataFrame:
    """TPC-H Q4 shape: semi-join (EXISTS) — orders with at least one line
    shipped after the order date, counted by priority."""
    late_lines = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.filter(F.year("o_orderdate") == year)
        .join(
            late_lines,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def ORDER_PRIORITY_COUNTS_SQL(year: int = 1997) -> str:
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE year(o_orderdate) = {year}
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""


def promo_revenue(
    lineitem: DataFrame, part: DataFrame, month: str = "1997-06-01"
) -> DataFrame:
    """TPC-H Q14 shape: promo-part revenue share for one month. The part
    dim joins on partkey (broadcast under the threshold, shuffle-hash
    above); the month filter prunes the fact scan first."""
    m0 = F.lit(month).cast("timestamp")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= m0)
            & (F.col("l_shipdate") < m0 + F.expr("INTERVAL 1 MONTH"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def PROMO_REVENUE_SQL(month: str = "1997-06-01") -> str:
    return f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 6)
         AS promo_revenue_pct,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS total_revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{month} 00:00:00'
  AND l_shipdate < TIMESTAMP '{month} 00:00:00' + INTERVAL 1 MONTH
"""


def size_quantiles(binlog: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of statement size per
    event type — `percentile` is exact (sort-based within groups), matching
    SQL `quantile_cont`; for sketch-sized state at 100 TB swap in
    `percentile_approx` (t-digest) at the cost of oracle exactness."""
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(single_statement_size, {p})"), 4
    ).cast("double")
    return binlog.groupBy("event_type").agg(
        pct(0.5).alias("p50_size"),
        pct(0.9).alias("p90_size"),
        pct(0.99).alias("p99_size"),
        F.max("single_statement_size").alias("max_size"),
    )


def SIZE_QUANTILES_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql})
SELECT event_type,
       CAST(round(quantile_cont(single_statement_size, 0.5), 4) AS DOUBLE)
         AS p50_size,
       CAST(round(quantile_cont(single_statement_size, 0.9), 4) AS DOUBLE)
         AS p90_size,
       CAST(round(quantile_cont(single_statement_size, 0.99), 4) AS DOUBLE)
         AS p99_size,
       max(single_statement_size) AS max_size
FROM binlog
GROUP BY 1
"""


def size_quantiles_approx(binlog: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Sketch-based percentiles (`percentile_approx`, t-digest-style
    bounded state) — the 100 TB path where exact per-group sorts are not
    worth it. No SQL oracle (sketch results are engine-specific);
    correctness is bounded-error vs the exact percentiles in tests."""
    pct = lambda p: F.expr(  # noqa: E731
        f"percentile_approx(single_statement_size, {p}, {accuracy})"
    ).cast("double")
    return binlog.groupBy("event_type").agg(
        pct(0.5).alias("p50_size"),
        pct(0.9).alias("p90_size"),
        pct(0.99).alias("p99_size"),
        F.count(F.lit(1)).alias("n"),
    )


def size_quantiles_approx_check(
    binlog: DataFrame, accuracy: int = 10000, rank_tol: float = 0.01
) -> DataFrame:
    """Driver-checkable twin of ``size_quantiles_approx`` (VERDICT r04 #6):
    the sketch values themselves are engine-specific, but the *bounded
    error* contract is deterministic. ``percentile_approx`` guarantees
    rank error ≤ N/accuracy, so the check is rank-based (value tolerances
    break on sparse tails): per event type, emit 1 when the approx p-th
    percentile lies between the exact (p−rank_tol) and (p+rank_tol)
    quantiles — rank_tol=0.01 is 100× the sketch's ε=1/accuracy. Oracle =
    all-ones, so the driver hash-checks the error bound.

    Exact and approx percentiles compute in the SAME single-shuffle
    aggregate (one partial+final pass; the exact side is the small-group
    sort the sketch replaces at 100 TB — affordable at check time)."""
    exact = lambda p: F.expr(f"percentile(single_statement_size, {p})")  # noqa: E731
    approx = lambda p: F.expr(  # noqa: E731
        f"percentile_approx(single_statement_size, {p}, {accuracy})"
    ).cast("double")

    def ok(p: float, name: str):
        lo = exact(max(0.0, p - rank_tol))
        hi = exact(min(1.0, p + rank_tol))
        return (approx(p).between(lo, hi)).cast("int").alias(name)

    return binlog.groupBy("event_type").agg(
        ok(0.5, "p50_ok"), ok(0.9, "p90_ok"), ok(0.99, "p99_ok")
    )


def SIZE_QUANTILES_APPROX_CHECK_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql})
SELECT DISTINCT event_type,
       CAST(1 AS INT) AS p50_ok,
       CAST(1 AS INT) AS p90_ok,
       CAST(1 AS INT) AS p99_ok
FROM binlog
"""


def daily_distinct_gtids_approx_check(
    binlog: DataFrame, rsd: float = 0.01, rel_bound: float = 0.05
) -> DataFrame:
    """Driver-checkable twin of ``daily_distinct_gtids_approx`` (VERDICT
    r04 #6): per day, 1 when the HLL++ estimate is within
    max(1, rel_bound·exact) of the exact distinct count (rel_bound = 5×
    the sketch's rsd — a hard gate over the probabilistic guarantee).
    Both counts in one aggregate; oracle = all-ones."""
    approx = F.approx_count_distinct("gtid", rsd)
    exact = F.count_distinct("gtid")
    return binlog.groupBy(
        F.date_format("execute_time", "yyyy-MM-dd").alias("day")
    ).agg(
        (
            F.abs(approx - exact)
            <= F.greatest(F.lit(1.0), exact * F.lit(rel_bound))
        )
        .cast("int")
        .alias("within_tolerance")
    )


def DAILY_DISTINCT_GTIDS_CHECK_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql})
SELECT strftime(execute_time, '%Y-%m-%d') AS day,
       CAST(1 AS INT) AS within_tolerance
FROM binlog
GROUP BY 1
"""


def daily_distinct_gtids_approx(binlog: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HyperLogLog++ distinct transactions per day (`approx_count_distinct`,
    fixed 2^p registers vs the exact count's per-key state). No SQL oracle
    (HLL estimates are engine-specific); bounded-error tested locally."""
    return binlog.groupBy(
        F.date_format("execute_time", "yyyy-MM-dd").alias("day")
    ).agg(
        F.approx_count_distinct("gtid", rsd).alias("approx_gtids"),
        F.count(F.lit(1)).alias("event_count"),
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate Pandas UDAF (the one justified Python-aggregate shape)
# ---------------------------------------------------------------------------

def size_mad_per_type(binlog: DataFrame) -> DataFrame:
    """Median absolute deviation of statement size per event type, as an
    Arrow-batched grouped-aggregate ``pandas_udf``.

    The deliberate Python-UDAF example: MAD is *holistic* (median of
    deviations from the group's own median), so the relational form needs
    two aggregation passes joined back together, while the grouped-agg
    UDAF computes it in ONE shuffle — each group's values arrive as a
    pandas Series in the Python worker. That tradeoff (plan shape vs
    leaving codegen) is exactly when a Python aggregate is justified;
    everything decomposable stays JVM-side (see size_quantiles).

    Skew note: a grouped-agg UDAF materializes each whole group in one
    worker — keys here are event types (bounded domain, bounded group
    size ~ rows/types). For high-cardinality or heavy-hitter keys, use
    ``applyInPandas`` with pre-aggregation or salting instead.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        return float((v - v.median()).abs().median())

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # pandas aggregate too
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    return binlog.groupBy("event_type").agg(
        F.round(mad("single_statement_size"), 4).alias("size_mad"),
        n_rows("single_statement_size").alias("n"),
    )


def SIZE_MAD_SQL(binlog_sql: str) -> str:
    """Relational twin (double-pass median + join) — the oracle proves the
    one-shuffle UDAF equals the decomposed form."""
    return f"""
WITH binlog AS ({binlog_sql}),
med AS (
  SELECT event_type, median(single_statement_size) AS m
  FROM binlog GROUP BY 1
)
SELECT b.event_type,
       round(median(abs(b.single_statement_size - med.m)), 4) AS size_mad,
       count(*) AS n
FROM binlog b JOIN med USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Correlated scalar subquery (SQL API; Catalyst decorrelation)
# ---------------------------------------------------------------------------

TOP_CUSTOMER_SQL_TEXT = """
SELECT n.n_name AS nation,
       (SELECT max(c.c_acctbal) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS max_acctbal,
       (SELECT count(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0) AS n_positive
FROM nation n
"""


def nation_top_customer(spark, nation: DataFrame, customer: DataFrame) -> DataFrame:
    """Correlated scalar subqueries through the SQL API (``spark.sql``) —
    the registry otherwise exercises only the DataFrame API; both front
    ends land in the same Catalyst plan space.

    Catalyst DECORRELATES each scalar subquery into an aggregate-then-join
    (``RewriteCorrelatedScalarSubquery``): the plan is two grouped
    aggregates over customer joined to nation, not a per-nation rescan —
    at scale the correlated form costs the same as the hand-written join.
    """
    nation.createOrReplaceTempView("nation")
    customer.createOrReplaceTempView("customer")
    return spark.sql(TOP_CUSTOMER_SQL_TEXT)


NATION_TOP_CUSTOMER_SQL = """
SELECT n.n_name AS nation,
       (SELECT max(c.c_acctbal) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS max_acctbal,
       CAST((SELECT count(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0) AS BIGINT)
         AS n_positive
FROM nation n
"""


# ---------------------------------------------------------------------------
# Day-over-day diff (full outer join)
# ---------------------------------------------------------------------------

def day_over_day_counts(binlog: DataFrame) -> DataFrame:
    """Per-(day, event_type) count with the previous day's count and the
    delta — via FULL OUTER self-join of the daily rollup against itself
    shifted by one day, so days present on only one side still appear
    (the lag-window form silently skips gap days; the outer join is the
    report-correct shape).

    Join inputs are rollup rows (days x types) — both sides tiny, AQE
    broadcasts one; fact rows never reach the join.
    """
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators.rollups import (
        daily_event_counts,
    )

    daily = daily_event_counts(binlog)
    prev = daily.select(
        F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd").alias("day"),
        F.col("event_type"),
        F.col("event_count").alias("prev_count"),
    )
    return (
        daily.join(prev, ["day", "event_type"], "full_outer")
        .select(
            "day",
            "event_type",
            F.coalesce("event_count", F.lit(0)).cast("long").alias("event_count"),
            F.coalesce("prev_count", F.lit(0)).cast("long").alias("prev_count"),
            (
                F.coalesce("event_count", F.lit(0))
                - F.coalesce("prev_count", F.lit(0))
            ).cast("long").alias("delta"),
        )
    )


DAY_OVER_DAY_SQL = """
daily AS (
  SELECT strftime(CAST(execute_time AS DATE), '%Y-%m-%d') AS day, event_type,
         count(*) AS event_count
  FROM binlog GROUP BY 1, 2
),
prev AS (
  SELECT strftime(CAST(day AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d') AS day,
         event_type, event_count AS prev_count
  FROM daily
)
SELECT COALESCE(daily.day, prev.day) AS day,
       COALESCE(daily.event_type, prev.event_type) AS event_type,
       CAST(COALESCE(daily.event_count, 0) AS BIGINT) AS event_count,
       CAST(COALESCE(prev.prev_count, 0) AS BIGINT) AS prev_count,
       CAST(COALESCE(daily.event_count, 0) - COALESCE(prev.prev_count, 0)
            AS BIGINT) AS delta
FROM daily FULL OUTER JOIN prev
  ON daily.day = prev.day AND daily.event_type = prev.event_type
"""


def large_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 150.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: customers behind over-quantity orders.

    The HAVING subquery becomes an aggregate-then-join: lineitem rolls up
    to per-order quantity (partial+final on the l_orderkey shuffle), the
    filtered survivors join orders ON THE SAME KEY — Catalyst reuses the
    orderkey partitioning, so the big fact table shuffles once — and the
    customer dim joins broadcast. TakeOrderedAndProject caps the output
    without a global sort. Sums of integral quantities are exact in double.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") >= min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", DAY_FMT).alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def LARGE_ORDER_CUSTOMERS_SQL(min_qty: float = 150.0, k: int = 100) -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) >= {min_qty}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT {k}
"""
