"""Session windows — built-in `session_window` + a custom stateful operator.

Two implementations of gap-based sessionization over the events stream:

1. ``session_windows``: the built-in ``F.session_window`` (Spark ≥3.2) —
   works identically on batch and streaming frames; ALWAYS prefer this when
   the semantics fit (JVM-side state store, watermark-driven eviction).
2. ``sessionize_stateful``: ``applyInPandasWithState`` — the template for
   custom stateful operators Spark lacks.  Emits CLOSED sessions per user
   (a session closes when a later event arrives more than *gap* after it);
   the open tail session rides in the group state across micro-batches.
   State per key is O(1) (last_ts, start, count, cents) so 10^9 users fit
   the state store; a production variant would add EventTimeTimeout to
   flush idle sessions via watermark instead of waiting for the next event.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id LONG, session_start_us LONG, n_events LONG, value_cents LONG"
)
_STATE_SCHEMA = "start_us LONG, last_us LONG, n LONG, cents LONG"


def session_windows(events: DataFrame, gap: str = "12 hours") -> DataFrame:
    """Built-in gap sessionization (batch or streaming; SQL-oracle-checkable)."""
    return (
        events.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .groupBy("user_id", F.session_window("ts_tz", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "value_cents",
        )
    )


def sessionize_stateful(events: DataFrame, gap_us: int = 12 * 3600 * 1_000_000) -> DataFrame:
    """Custom stateful sessionization over a STREAMING events frame.

    Emits one row per closed session; the trailing open session stays in
    state and closes when a subsequent micro-batch brings a late-enough event.
    """

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(batches))
        if len(rows) == 0:
            return
        ordered = rows.assign(
            _us=rows["ts"].astype("int64") // 1000  # datetime64[ns] → μs
        ).sort_values("_us", kind="mergesort")
        ts_us = ordered["_us"].to_numpy()
        cents = ordered["value"].mul(100).round().astype("int64").to_numpy()
        if state.exists:
            start, last, n, c = state.get
        else:
            start = last = None
            n = c = 0
        out = []
        for t, v in zip(ts_us, cents):
            if start is None:
                start, last, n, c = int(t), int(t), 1, int(v)
            elif t - last > gap_us:
                out.append((user_id, start, n, c))
                start, last, n, c = int(t), int(t), 1, int(v)
            else:
                last, n, c = int(t), n + 1, c + int(v)
        state.update((start, last, n, c))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start_us", "n_events", "value_cents"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
