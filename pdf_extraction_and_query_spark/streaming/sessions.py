"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState``.

The batch twin is ``operators/stats.sessionize`` (lag + running-sum windows);
here the same gap rule runs CONTINUOUSLY: per-user state carries the open
session (start/end epoch, event count, next session ordinal) across
micro-batches; a session is emitted as soon as a later event proves the gap.
Each user's final session stays in state until more events arrive — flushing
idle users belongs to an event-time-timeout + watermark variant (a
processing-time timeout is deliberately NOT registered: pending timeouts
keep an availableNow drain alive for the full timeout period). State is O(1) per user
(five longs) — the canonical shape for keyed state at 10^9-user scale, where
Spark shards state by key across executors and checkpoints it with the
stream.

Event-time caveat (documented, not hidden): events are assigned to sessions
in ARRIVAL order per micro-batch; late events older than the open session's
start are counted into the open session rather than re-opening closed ones
(closed sessions are immutable once emitted). With in-order input the output
equals the batch operator exactly — test_streaming_sessions proves both the
cross-batch merge and the batch-twin equality.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60  # same rule as operators/stats.sessionize

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_epoch long, end_epoch long"
)
STATE_SCHEMA = (
    "next_session long, n_events long, start_epoch long, end_epoch long"
)


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold this batch's events (sorted by ts, event_id) into the open
    session; emit every session that closes. Runs per user key."""
    (user_id,) = key
    if state.exists:
        next_session, n_events, start_epoch, end_epoch = state.get
    else:
        # session ids are 1-based, matching the batch twin's running sum
        next_session, n_events, start_epoch, end_epoch = 1, 0, None, None

    closed = []
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
    for ts in rows["ts"]:
        epoch = int(ts.timestamp())
        if n_events and epoch - end_epoch > SESSION_GAP_SEC:
            closed.append(
                (user_id, next_session, n_events, start_epoch, end_epoch)
            )
            next_session += 1
            n_events, start_epoch = 0, None
        if not n_events:
            start_epoch = epoch
        n_events += 1
        end_epoch = epoch if n_events == 1 else max(end_epoch, epoch)
    state.update((next_session, n_events, start_epoch, end_epoch))

    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_id", "n_events", "start_epoch", "end_epoch"],
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization: one keyed-state operator, update output
    mode (emits each closed session exactly once)."""
    return (
        events_stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
