"""Streaming window-funnel: incremental per-user step transitions.

The batch ``operators/funnels.window_funnel`` folds an anchored-greedy
automaton over each user's full event history; this job runs the SAME
automaton incrementally over a stream, emitting one row per step
transition (user, step, reached_at) — the append-only feed behind a live
funnel dashboard (counts per step = the batch query's ``users_reached``).

Order correctness: the automaton is order-sensitive, and micro-batches
are not event-time ordered across batches. Events therefore buffer in
state and are folded ONLY once the watermark passes them (sorted at fold
time) — the same finalize-below-watermark contract the sessionizer uses,
which makes the streamed transitions provably equal to the batch fold
over every event at or below the final watermark.

Scale / state design:
- state per user = automaton (level, t1, prev) + the not-yet-finalized
  event buffer, bounded by the watermark delay — NOT by history length;
- completed funnels (level == n_steps) drop their state entirely: a
  converted user costs nothing forever after;
- only step-typed events reach the operator (filter pushed to the
  source scan);
- timeouts re-invoke a key only while it still buffers events.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("step_name", T.StringType()),
        T.StructField("reached_at", T.TimestampType()),
    ]
)

# (level, t1_ms, prev_ms, buffered ts_ms, buffered step index)
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("level", T.IntegerType()),
        T.StructField("t1_ms", T.LongType()),
        T.StructField("prev_ms", T.LongType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_step", T.ArrayType(T.IntegerType())),
    ]
)


def make_funnel_fn(steps: Sequence[str], window_seconds: int):
    """Build the applyInPandasWithState function: the batch automaton, fed
    watermark-finalized events in time order."""
    n = len(steps)
    win_ms = int(window_seconds) * 1000

    def fold(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        level, t1, prev = 0, 0, 0
        buf: list[tuple[int, int]] = []
        if state.exists:
            level, t1, prev, buf_ts, buf_step = state.get
            buf = list(zip(buf_ts, buf_step))
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(
                    zip(
                        (pdf["ts"].astype("int64") // 1_000_000).tolist(),
                        pdf["step_idx"].tolist(),
                    )
                )

        wm = state.getCurrentWatermarkMs()
        ripe = sorted(t for t in buf if t[0] <= wm)
        keep = [t for t in buf if t[0] > wm]

        out: list[dict[str, Any]] = []
        for ts_ms, step_idx in ripe:
            if level >= n:
                break
            advance = step_idx == level + 1 and (
                level == 0 or (ts_ms > prev and ts_ms <= t1 + win_ms)
            )
            if advance:
                level += 1
                if level == 1:
                    t1 = ts_ms
                prev = ts_ms
                out.append(
                    {
                        "user_id": key[0],
                        "step": level,
                        "step_name": steps[level - 1],
                        "reached_at": pd.Timestamp(ts_ms, unit="ms"),
                    }
                )

        if level >= n or not keep:
            # converted users and users with nothing buffered carry only
            # their (tiny) automaton — or nothing at all once converted
            if level >= n or level == 0:
                if state.exists:
                    state.remove()
            elif wm >= t1 + win_ms:
                # the anchored window closed at/below the watermark: every
                # future event arrives with ts > wm >= t1 + win, so this
                # partial funnel can never advance — drop the state
                # instead of carrying it forever (ADVICE r03: bounded
                # state for non-converting users)
                if state.exists:
                    state.remove()
            else:
                state.update((level, t1, prev, [], []))
                # wake at window close so the dead state self-collects
                # even if the user never sends another event
                state.setTimeoutTimestamp(max(t1 + win_ms, wm + 1))
        else:
            state.update(
                (level, t1, prev, [t[0] for t in keep], [t[1] for t in keep])
            )
            state.setTimeoutTimestamp(max(min(t[0] for t in keep), wm + 1))

        if out:
            yield pd.DataFrame(out)

    return fold


def funnel_transitions_stream(
    events_stream: DataFrame,
    steps: Sequence[str],
    window_seconds: int = 3600,
    allowed_lateness: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-user funnel transition stream (module docstring)."""
    steps = list(steps)
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))]
    )
    typed = (
        events_stream.filter(F.col("event_type").isin(steps))
        .withColumn("step_idx", step_map[F.col("event_type")].cast("int"))
        .select("user_id", "ts", "step_idx")
    )
    return typed.withWatermark("ts", allowed_lateness).groupBy(
        "user_id"
    ).applyInPandasWithState(
        make_funnel_fn(steps, window_seconds),
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_funnel_job(
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    steps: Sequence[str] = ("view", "click", "purchase"),
    window_seconds: int = 3600,
    allowed_lateness: str = "5 minutes",
    available_now: bool = False,
) -> StreamingQuery:
    transitions = funnel_transitions_stream(
        events_stream, steps, window_seconds, allowed_lateness
    )
    writer = (
        transitions.select(
            "user_id",
            "step",
            "step_name",
            F.date_format("reached_at", "yyyy-MM-dd HH:mm:ss").alias("reached_at"),
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
