"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState`.

The reference's only "state" is the in-flight task set of its polling
loop (web_scheduler.py:43-47, :1310-1316); it cannot express
per-entity state over an event stream at all. This operator is the
Structured-Streaming-native form of the batch sessionizer
(operators/advanced.py::w04_sessionize): per-user inactivity-gap
sessions, maintained incrementally across micro-batches with
checkpointed state.

Semantics
---------
- Events are grouped by ``user_id``; within each micro-batch the
  group's rows are sorted by event time, then chained onto the open
  session carried in state (session_start, last_ts, n_events).
- A gap > ``gap`` CLOSES the open session: it is emitted downstream
  and a new session starts. The still-open tail session stays in
  state — emitted only once a later event (or batch) closes it.
- State survives query restarts via the checkpoint, so a monitor can
  be stopped and resumed without losing or double-counting sessions
  (exercised in tests/test_streaming.py).

Ordering caveat: events arriving *across* micro-batches out of
event-time order are treated as session re-openers (classic
processing-order hazard). Production guard: watermark + event-time
timeout, or the built-in ``session_window`` aggregation when the
output shape fits it. Within a batch, sorting fixes ordering.

Scale: state is one 3-field tuple per ACTIVE user — memory is bounded
by cardinality of in-flight keys, not event volume; the shuffle is
the same single user_id exchange the batch twin performs, applied to
each micro-batch's delta only. Arrow moves each group as a columnar
batch; the per-group work is vectorized (cumsum over a gap flag), not
a per-row Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_DDL = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
# state as epoch-MICROsecond integers: exact (no float rounding of
# sub-second timestamps), and matches parquet µs precision
STATE_DDL = "session_start BIGINT, last_ts BIGINT, n_events BIGINT"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Closed sessions per user from a streaming events DataFrame
    (schema from streaming.monitor.stream_events: ts TIMESTAMP).

    Emits one row per session the moment a later event proves it
    closed (inactivity > ``gap_seconds``). The open tail session per
    user lives in checkpointed state until then.
    """

    def _sessionize(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        parts = [pdf[["ts"]] for pdf in pdfs]
        batch = pd.concat(parts, ignore_index=True).sort_values("ts")
        ts = batch["ts"].astype("int64") // 1000  # epoch microseconds

        if state.exists:
            open_start, open_last, open_n = state.get
        else:
            open_start, open_last, open_n = None, None, 0

        prev = ts.shift(1)
        if open_last is not None:
            prev.iloc[0] = open_last
        # gap > threshold (or no predecessor at all) opens a session
        new_sess = prev.isna() | ((ts - prev) > gap_seconds * 1_000_000)
        sess_id = new_sess.cumsum()  # 1-based within this batch

        agg = (
            pd.DataFrame({"ts": ts, "sid": sess_id})
            .groupby("sid")["ts"]
            .agg(["min", "max", "count"])
        )
        starts = agg["min"].to_list()
        ends = agg["max"].to_list()
        counts = agg["count"].to_list()

        # first batch-session continues the open state session unless
        # the boundary gap re-opened (new_sess on row 0)
        if open_start is not None and not bool(new_sess.iloc[0]):
            starts[0] = open_start
            counts[0] += open_n

        closed = pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": pd.to_datetime(starts[:-1], unit="us"),
                "session_end": pd.to_datetime(ends[:-1], unit="us"),
                "n_events": pd.Series(counts[:-1], dtype="int64"),
            }
        )
        # everything before the last batch-session is provably closed;
        # the open state session closes too if the boundary gapped
        if open_start is not None and bool(new_sess.iloc[0]):
            closed = pd.concat(
                [
                    pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "session_start": pd.to_datetime([open_start], unit="us"),
                            "session_end": pd.to_datetime([open_last], unit="us"),
                            "n_events": pd.Series([open_n], dtype="int64"),
                        }
                    ),
                    closed,
                ],
                ignore_index=True,
            )

        state.update((int(starts[-1]), int(ends[-1]), int(counts[-1])))
        yield closed

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
