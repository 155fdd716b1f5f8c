"""Behavioral event analytics: window funnels and retention cohorts.

The reference's whole purpose is event analytics over a ClickHouse cluster
(Grafana dashboards over binlog event streams, ``/root/reference/README.md:350``).
ClickHouse's signature operators for that workload — ``windowFunnel`` and
``retention`` — have no reference implementation to port (the repo predates
them in production use), but a user moving a CH-backed analytics stack onto
this engine expects them. Both are re-expressed Spark-first here: one
shuffle on ``user_id``, per-user state folded JVM-side with higher-order
functions (no Python in the hot path), then a tiny global reduce.

Scale notes (100 TB): per-user event lists are the same state shape
ClickHouse's ``windowFunnel`` aggregate keeps — bounded by events-per-user
within the analysis range, never by table size. The single hash shuffle
partitions by ``user_id`` (high cardinality, uniform); everything after it
is a single-row global aggregate (funnel) or a cohort×offset-sized rollup
(retention), so no second large shuffle exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int = 3600,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse ``windowFunnel``-style step completion counts.

    Semantics (deterministic, anchored-greedy; documented rather than
    configurable so the DuckDB oracle can mirror them exactly):

    - a user's funnel anchors at their EARLIEST ``steps[0]`` event (t1);
    - step k+1 completes at the earliest ``steps[k+1]`` event strictly
      after the previous step's event and within ``t1 + window_seconds``;
    - ``users_reached`` at step k counts users completing steps 1..k
      (cumulative, so the column is non-increasing down the funnel).

    Plan shape: filter to the step types (pushed to the scan) → one
    groupBy(user) collecting the (time, type) sequence → a JVM-side
    ``aggregate`` lambda folds the greedy automaton per user → one global
    single-row aggregate → ``stack`` unpivots to (step, step_name,
    users_reached). No joins, no Python, two exchanges (the second carries
    one row per partition).
    """
    steps = list(steps)
    n = len(steps)
    if n < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != n:
        # array_position always returns the FIRST occurrence, so the
        # automaton could never advance past a duplicated step while the
        # SQL oracle (and ClickHouse windowFunnel) handles repeats — fail
        # loudly instead of silently diverging (ADVICE r03)
        raise ValueError("funnel steps must be distinct")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    win_us = F.lit(int(window_seconds) * 1_000_000).cast("long")

    per_user = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("t"),
                        F.col(type_col).alias("etype"),
                    )
                )
            ).alias("seq")
        )
    )

    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("level"), zero.alias("t1"), zero.alias("prev")
    )

    def _fold(acc, x):
        # advance iff this event is the NEXT step and (for steps past the
        # anchor) strictly later than the previous step, inside the window
        pos = F.array_position(steps_arr, x["etype"])
        advance = (pos == acc["level"] + 1) & (
            (acc["level"] == 0)
            | ((x["t"] > acc["prev"]) & (x["t"] <= acc["t1"] + win_us))
        )
        return F.when(
            advance,
            F.struct(
                (acc["level"] + 1).alias("level"),
                F.when(acc["level"] == 0, x["t"]).otherwise(acc["t1"]).alias("t1"),
                x["t"].alias("prev"),
            ),
        ).otherwise(acc)

    levels = per_user.select(
        F.aggregate("seq", init, _fold)["level"].alias("level")
    )
    counts = levels.agg(
        *[
            F.sum((F.col("level") >= k).cast("long")).alias(f"c{k}")
            for k in range(1, n + 1)
        ]
    )
    stack_args = ", ".join(
        f"{k}, '{steps[k - 1]}', coalesce(c{k}, 0)" for k in range(1, n + 1)
    )
    return counts.selectExpr(
        f"stack({n}, {stack_args}) AS (step, step_name, users_reached)"
    )


def WINDOW_FUNNEL_SQL(
    steps: Sequence[str], window_seconds: int = 3600, table: str = "events"
) -> str:
    """DuckDB oracle: the same anchored-greedy chain as min-filter CTEs.

    ``sK`` holds users whose k-th step completed (with its completion
    time); each CTE takes the earliest qualifying event — exactly the
    greedy automaton ``window_funnel`` folds per user.
    """
    steps = list(steps)
    ctes = [
        f"s1 AS (SELECT {table}.user_id, min(ts) AS t1, min(ts) AS prev "
        f"FROM {table} WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(s{k - 1}.t1) AS t1, min(e.ts) AS prev\n"
            f"  FROM {table} e JOIN s{k - 1} USING (user_id)\n"
            f"  WHERE e.event_type = '{steps[k - 1]}' AND e.ts > s{k - 1}.prev\n"
            f"    AND e.ts <= s{k - 1}.t1 + INTERVAL {int(window_seconds)} SECOND\n"
            f"  GROUP BY e.user_id)"
        )
    unions = "\nUNION ALL ".join(
        f"SELECT {k} AS step, '{steps[k - 1]}' AS step_name, "
        f"(SELECT count(*) FROM s{k}) AS users_reached"
        for k in range(1, len(steps) + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: users active N days after their first-seen day.

    ClickHouse's ``retention()`` aggregate answers "of users who did X,
    how many came back on day N" — the dashboard behind every DAU/WAU
    panel. Cohorts here are the user's first active day; one row per
    (cohort_day, day_offset) with the distinct active user count.

    Plan shape: one groupBy(user) building (first day, active-day set)
    — per-user state bounded by the day horizon, not event volume — then
    an explode and a cohort×offset rollup whose key space is tiny
    (days × horizon), so the second shuffle carries rollup-sized data.
    """
    per_user = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day"),
        F.collect_set(F.to_date(ts_col)).alias("days"),
    )
    return (
        per_user.select("cohort_day", F.explode("days").alias("day"))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


RETENTION_COHORTS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT strftime(cohort.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort.cohort_day, ud.day) AS INT) AS day_offset,
       count(*) AS active_users
FROM ud JOIN cohort USING (user_id)
GROUP BY 1, 2
"""
