"""Stateful streaming analytics over event/transcript streams.

Two Structured-Streaming-native operators complementing the foreachBatch
incremental driver (streaming/incremental.py):

* ``sessionize_stream`` — custom stateful sessionization via
  ``applyInPandasWithState``: per-user state carries the open session
  (start, last_ts, n_events); an event arriving more than ``gap_s`` after
  the last one CLOSES the open session (emitted downstream) and opens a new
  one.  State survives micro-batches through the checkpoint, so sessions
  span arbitrarily many triggers.  The batch q35 query is the relational
  twin (lag + cumulative windows) — same gap rule.

* ``windowed_event_counts`` — the canonical watermark + tumbling-window
  aggregation: late events beyond the watermark are dropped, windows
  finalize once the watermark passes their end.

Open sessions are emitted only when closed by a later event (streaming
semantics: an open session is not yet a fact).  A GroupStateTimeout-based
flush can be added where downstream needs provisional sessions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.LongType(), False),
        T.StructField("session_end", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType(), False),
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events stream (user_id long, ts timestamp, ...) -> closed sessions.

    Within a micro-batch events are processed in ts order; cross-batch order
    is the trigger order (use a watermark upstream to bound disorder)."""

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple[int, int, int, int]] = []
        for pdf in pdfs:
            ts = sorted(int(t) for t in pdf["tsec"])
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_s:
                    closed.append((int(user_id), start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = t
                    n += 1
        if start is not None:
            state.update((start, last, n))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("long").alias("tsec"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window event counts per event_type with late-data handling:
    events later than ``watermark`` behind the max seen ts are dropped and
    windows finalize once the watermark passes (append-mode compatible)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
