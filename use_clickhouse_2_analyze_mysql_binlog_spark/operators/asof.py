"""As-of join and range (interval) join — operators Spark lacks as built-ins.

The reference contains no joins at all (SURVEY.md §2.3), but both operators
are core to time-series analytics over binlog-shaped facts (attach the most
recent checkpoint/quote to every event; count events inside maintenance
windows), so the engine exposes them as first-class, scale-designed
compositions of built-in DataFrame ops — no UDFs, no mapPartitions.

Scale design:

- **As-of join** is NOT implemented as a theta-join (``l.key = r.key AND
  r.ts <= l.ts`` makes Spark pick a sort-merge/nested-loop plan that
  produces every preceding match before aggregation — quadratic per key).
  Instead: tag both sides, ``unionByName``, one window
  ``last(right_payload, ignorenulls=True)`` ordered by (ts, side) per key.
  One shuffle on the key, linear state, no candidate blow-up; skewed keys
  are handled by AQE the same as any single-key shuffle.

  Round 7 added the **interval form** (``asof_join_interval``): the right
  side gets a per-key ``lead`` neighbor so each right row owns a
  half-open validity interval and the join is equi+range with at most
  one hit per left row — also one exchange per side (the window's
  exchange is the join's), and the left side skips the window entirely.
  Both forms are property-tested byte-equivalent; the translator's CH
  ``ASOF JOIN`` rewrite emits the same interval shape in SQL.

- **Range join** against an interval table is implemented by *time
  binning*: intervals explode into the fixed-width bins they overlap,
  facts compute their bin, and the join becomes an equi-join on ``bin``
  followed by the exact range predicate. Equi-join ⇒ hash join ⇒ shuffles
  scale linearly; a small interval side additionally broadcasts (Spark
  picks that automatically under the broadcast threshold). The bin width
  is the knob: ≈ median interval length keeps duplication (intervals per
  bin × bins per interval) near 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the payload of the latest
    right row with ``right_time <= left_time`` for the same ``on`` key
    (inner semantics — left rows with no preceding right row are dropped).

    Right rows must be unique per (key, time) — pre-aggregate otherwise
    (ties would be nondeterministic in any engine, DuckDB ASOF included).
    """
    r = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in right_payload],
        ).alias("__payload"),
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[c for c in left.columns if c != on],
    )
    # Right rows sort before left rows at equal timestamps (__side 0 < 1),
    # giving the standard `right_time <= left_time` inclusive bound.
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l, allowMissingColumns=True)
        .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter((F.col("__side") == 1) & F.col("__m").isNotNull())
    )
    if tolerance_seconds is not None:
        matched = matched.filter(
            F.unix_timestamp("__t") - F.unix_timestamp("__m.__rt")
            <= tolerance_seconds
        )
    return matched.select(
        F.col(on),
        *[c for c in left.columns if c != on],
        F.col("__m.__rt").alias(f"asof_{right_time}"),
        *[F.col(f"__m.{c}").alias(c) for c in right_payload],
    )


def asof_join_interval(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join, interval form: the right side gets its
    per-key ``lead(right_time)`` neighbor, so "latest right row at or
    before left_time" becomes an equi+range join hitting each left row's
    unique validity interval — at most one match, no post-join dedup.

    ``how='inner'`` is the same contract as :func:`asof_join` (right
    rows unique per (key, time) — byte-equivalent output,
    property-tested). ``how='left'`` keeps unmatched left rows with
    NULL as-of columns (pandas ``merge_asof`` / CH ``ASOF LEFT JOIN``
    semantics); a tolerance miss likewise NULLs the match instead of
    dropping the row. Measured 2× faster at sf0.1 (r07 notes): the left
    rows never pass through a window, and the neighbor window's hash
    exchange on the key is the same partitioning the sort-merge join
    needs, so each side is exchanged exactly once. Candidate for the
    :func:`trade_quote_asof` default in round 8 (registry-window
    constraint, ROUND7_NOTES)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w = Window.partitionBy("__k").orderBy("__rt")
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__rt"),
        *[F.col(c) for c in right_payload],
    ).withColumn("__nxt", F.lead("__rt").over(w))
    cond = (
        (left[on] == r["__k"])
        & (left[left_time] >= r["__rt"])
        & (r["__nxt"].isNull() | (left[left_time] < r["__nxt"]))
    )
    out = left.join(r, cond, how)
    in_tol = None
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_timestamp(left[left_time]) - F.unix_timestamp("__rt")
            <= tolerance_seconds
        )
        if how == "inner":
            out = out.filter(in_tol)

    def _masked(col, name):
        if how == "left" and in_tol is not None:
            return F.when(in_tol, col).alias(name)
        return col.alias(name)

    return out.select(
        left[on],
        *[left[c] for c in left.columns if c != on],
        _masked(F.col("__rt"), f"asof_{right_time}"),
        *[_masked(r[c], c) for c in right_payload],
    )


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join facts to every interval containing them (half-open
    ``start <= t < end``) via fixed-width time bins (see module scale
    notes). Intervals must be bounded; facts keep all their columns plus
    the interval's."""
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bin_seconds),
            )
        ),
    )
    fx = facts.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(time_col)) / bin_seconds)
    )
    return (
        fx.join(iv, "__bin")
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) < F.col(end_col))
        )
        .drop("__bin")
    )


# ---------------------------------------------------------------------------
# Registry queries over the binlog view
# ---------------------------------------------------------------------------

def trade_quote_asof(binlog: DataFrame) -> DataFrame:
    """Even-position statements ("trades") as-of joined to the latest
    preceding odd-position statement ("quotes") of the same transaction —
    the canonical as-of shape, on binlog columns.

    Round 8: default switched from the union+window form
    (:func:`asof_join`) to the interval form (:func:`asof_join_interval`)
    — byte-equivalent (property-tested), measured ~2× faster at sf0.1
    (ROUND7/8_NOTES): trades never pass through a window, and the quote
    side's lead-neighbor window exchange on ``gtid`` is the same
    partitioning the sort-merge join needs."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators.transactions import TS_FMT

    trades = binlog.filter(F.col("binlog_pos") % 2 == 0).select(
        "gtid",
        F.col("execute_time").alias("trade_time"),
        F.col("binlog_pos").alias("trade_pos"),
        F.col("single_statement_size").alias("trade_size"),
    )
    quotes = (
        binlog.filter(F.col("binlog_pos") % 2 == 1)
        .groupBy("gtid", F.col("execute_time").alias("quote_time"))
        .agg(F.max("single_statement_size").alias("quote_size"))
    )
    out = asof_join_interval(
        trades,
        quotes,
        on="gtid",
        left_time="trade_time",
        right_time="quote_time",
        right_payload=["quote_size"],
    )
    return out.select(
        "gtid",
        F.date_format("trade_time", TS_FMT).alias("trade_time"),
        "trade_pos",
        "trade_size",
        F.date_format("asof_quote_time", TS_FMT).alias("quote_time"),
        "quote_size",
    )


def TRADE_QUOTE_ASOF_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql}),
trades AS (
  SELECT gtid, execute_time AS trade_time, binlog_pos AS trade_pos,
         single_statement_size AS trade_size
  FROM binlog WHERE binlog_pos % 2 = 0
),
quotes AS (
  SELECT gtid, execute_time AS quote_time,
         max(single_statement_size) AS quote_size
  FROM binlog WHERE binlog_pos % 2 = 1
  GROUP BY 1, 2
)
SELECT t.gtid,
       strftime(t.trade_time, '%Y-%m-%d %H:%M:%S') AS trade_time,
       t.trade_pos, t.trade_size,
       strftime(q.quote_time, '%Y-%m-%d %H:%M:%S') AS quote_time,
       q.quote_size
FROM trades t ASOF JOIN quotes q
  ON t.gtid = q.gtid AND q.quote_time <= t.trade_time
"""


def maintenance_window_counts(binlog: DataFrame) -> DataFrame:
    """Events inside the daily 02:00–03:00 maintenance window, counted per
    day — a range join of the fact table against a derived interval dim."""
    days = binlog.select(
        F.to_date("execute_time").alias("day")
    ).distinct()
    intervals = days.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.to_timestamp("day") + F.expr("INTERVAL 2 HOURS")).alias("win_start"),
        (F.to_timestamp("day") + F.expr("INTERVAL 3 HOURS")).alias("win_end"),
    )
    joined = range_join_binned(
        binlog.select("execute_time", "single_statement_size"),
        intervals,
        time_col="execute_time",
        start_col="win_start",
        end_col="win_end",
        bin_seconds=3600,
    )
    return joined.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("single_statement_size").alias("size_sum"),
    )


def MAINTENANCE_WINDOW_COUNTS_SQL(binlog_sql: str) -> str:
    return f"""
WITH binlog AS ({binlog_sql}),
win AS (
  SELECT strftime(day, '%Y-%m-%d') AS day,
         CAST(day AS TIMESTAMP) + INTERVAL 2 HOUR AS win_start,
         CAST(day AS TIMESTAMP) + INTERVAL 3 HOUR AS win_end
  FROM (SELECT DISTINCT CAST(execute_time AS DATE) AS day FROM binlog)
)
SELECT w.day, count(*) AS n_events,
       CAST(sum(b.single_statement_size) AS BIGINT) AS size_sum
FROM binlog b JOIN win w
  ON b.execute_time >= w.win_start AND b.execute_time < w.win_end
GROUP BY 1
"""
