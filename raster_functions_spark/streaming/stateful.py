"""Custom stateful streaming operators via ``applyInPandasWithState`` —
SURVEY.md §2.10's "custom stateful operator" slot.

The batch engine sessionizes with a lag+cumsum window (contract query
``sessionize``); on an unbounded stream the same semantics need per-key
state that survives microbatches. ``sessionize_stream`` keeps one open
session per key in the state store and emits a session row whenever a gap
closes it — the canonical applyInPandasWithState shape (Arrow-batched,
one state object per group, timeout hook for idle keys).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("closed_by", T.StringType()),   # 'gap' | 'timeout'
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us: int):
    return _dt.datetime.utcfromtimestamp(us / 1e6)


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      idle_timeout_sec: int | None = 3600,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Gap-based sessionization over a stream: one open session per user
    lives in the state store; events more than ``gap_sec`` after the
    session's last event close it (emitting a row) and start a new one.
    Idle keys flush through the processing-time timeout — without it an
    abandoned session would sit in state forever.

    Matches the batch ``sessionize`` contract semantics: a session's
    events are those with inter-event gaps ≤ gap_sec.

    Late-data contract: a late event within ``gap_sec`` of the open
    session merges (session bounds expand to include it); a late event
    more than ``gap_sec`` BEFORE the open session belongs to an earlier
    session — it is emitted immediately as its own gap-closed session
    (never merged: folding it into the open session would fabricate a
    span containing an internal gap the batch semantics forbid). Events
    belonging to an ALREADY-CLOSED session cannot re-open history —
    there is one open session per key in state, which is the standard
    streaming trade-off. When exact late-data semantics matter, run the
    batch ``sessionize`` as a backfill over the full event log (same
    formula, same output schema)."""
    gap_us = gap_sec * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user, "session_start": _ts(start_us),
                                 "session_end": _ts(last_us), "n_events": n,
                                 "closed_by": "timeout"}])
            return
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        out = []
        # drain ALL Arrow chunks first and sort ONCE: a key whose batch
        # spans several chunks (> arrow.maxRecordsPerBatch events) has no
        # intra-group ordering guarantee — per-chunk sorting would close
        # sessions against out-of-order timestamps and emit wrong bounds.
        # NULL timestamps are dropped: a NaT becomes INT64_MIN µs, which
        # would sort first, seed a garbage session start and crash _ts()
        # on emit — permanently failing the query on every batch retry
        all_ts = sorted(_us(t) for pdf in pdf_iter for t in pdf[ts_col]
                        if pd.notna(t))
        # interval merge over the full chronology: each event is a
        # [ts, ts, 1] interval and the carried open session is one
        # [start, last, n] interval — cross-batch arrival order is not
        # guaranteed, so late events may sort before the carried state.
        # Adjacent intervals within gap_sec merge; every merged interval
        # except the LAST is definitively closed (nothing later can
        # re-enter it), the last stays open in state. This reproduces the
        # batch lag+cumsum semantics over whatever chronology the stream
        # has seen, and a far-backward late event becomes its own closed
        # session instead of corrupting the open session's bounds.
        items = [[ts, ts, 1] for ts in all_ts]
        if start_us is not None:
            items.append([start_us, last_us, n])
        items.sort()
        merged: list[list[int]] = []
        for it in items:
            if merged and it[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], it[1])
                merged[-1][2] += it[2]
            else:
                merged.append(it)
        for s_us, e_us, cnt in merged[:-1]:
            out.append({"user_id": user, "session_start": _ts(s_us),
                        "session_end": _ts(e_us), "n_events": cnt,
                        "closed_by": "gap"})
        if merged:                   # all-NULL batch with no prior state:
            start_us, last_us, n = merged[-1]   # nothing to remember
            state.update((start_us, last_us, n))
            if idle_timeout_sec is not None:
                state.setTimeoutDuration(idle_timeout_sec * 1000)
        if out:
            yield pd.DataFrame(out)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_sec is not None else GroupStateTimeout.NoTimeout)
    return (events.groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "update", timeout))
