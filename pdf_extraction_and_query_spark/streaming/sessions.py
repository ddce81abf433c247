"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState``.

The batch twin is ``operators/stats.sessionize`` (lag + running-sum windows);
here the same gap rule runs CONTINUOUSLY: per-user state carries the open
session (start/end epoch, event count, next session ordinal) across
micro-batches; a session is emitted as soon as a later event proves the gap.

Two variants share the fold:

* ``sessionize_stream`` — NoTimeout: each user's final session stays in
  state until more events arrive (a processing-time timeout is deliberately
  NOT registered: pending timeouts keep an availableNow drain alive for the
  full timeout period).
* ``sessionize_stream_event_time`` — EventTimeTimeout + watermark: an idle
  user's open session is FLUSHED (emitted + state dropped) once the
  watermark passes ``session end + gap`` — the bounded-state contract for
  an unbounded user population; without it, users who never return would
  hold state forever.  Requires ``withWatermark`` upstream (applied inside).

State is O(1) per user (five longs) — the canonical shape for keyed state
at 10^9-user scale, where Spark shards state by key across executors and
checkpoints it with the stream.

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


_COLS = ["user_id", "session_id", "n_events", "start_epoch", "end_epoch"]


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
        yield pd.DataFrame(closed, columns=_COLS)


def _sessionize_group_event_time(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Same fold, plus the watermark/timeout protocol: on timeout the open
    session is flushed and the key's state dropped; on data, the timeout is
    re-armed to ``session end + gap`` (clamped above the current watermark —
    setting a timestamp at or below the watermark is an error after a late
    burst)."""
    (user_id,) = key

    if state.hasTimedOut:
        next_session, n_events, start_epoch, end_epoch = state.get
        state.remove()
        if n_events:
            yield pd.DataFrame(
                [(user_id, next_session, n_events, start_epoch, end_epoch)],
                columns=_COLS,
            )
        return

    if state.exists:
        next_session, n_events, start_epoch, end_epoch = state.get
    else:
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
    state.setTimeoutTimestamp(
        max((end_epoch + SESSION_GAP_SEC) * 1000, state.getCurrentWatermarkMs() + 1)
    )

    if closed:
        yield pd.DataFrame(closed, columns=_COLS)


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


def sessionize_stream_event_time(
    events_stream: DataFrame, late_allowance: str = "1 second"
) -> DataFrame:
    """Streaming sessionization with idle-session flushing: once the event-time
    watermark (max ts seen − late_allowance) passes an open session's
    ``end + gap``, the session is emitted and the user's state dropped.
    Same output contract as :func:`sessionize_stream`; after the watermark
    has passed every user's horizon the emitted set equals the batch twin's
    full output (test_streaming_sessions)."""
    from pyspark.sql import functions as F

    events = events_stream.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    ).withWatermark("ts", late_allowance)
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group_event_time,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
