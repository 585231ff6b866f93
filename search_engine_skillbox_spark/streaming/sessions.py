"""Stateful streaming sessionization — applyInPandasWithState (the
Arrow-batched custom-stateful-operator API) as the streaming twin of
the batch window-function sessionizer (operators/pipeline.sessionize).

Per user, the state is ONE open session (start, end, n, total) plus the
next session index. A micro-batch's events merge into it; every
inactivity gap > gap_minutes closes a session, which is EMITTED with
its chronological index; the trailing open session stays in state with
an event-time timeout at (end + gap), so a user who goes quiet still
gets their last session flushed once the watermark passes it. After a
flush the state keeps a counter-only residue (one 5-field tuple, no
timeout) so a RETURNING user's sessions continue the chronological
numbering instead of restarting at 1 — state is bounded by open
sessions plus one tiny tombstone per user ever seen, not by event
history.

Stream ≡ batch is pinned in tests/test_streaming: the emitted closed
sessions equal the batch sessionizer's rows for every session the
stream was able to finalize.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_SCHEMA

OUT_SCHEMA = ("user_id long, session_idx long, n_events long, "
              "total_value double, session_start string, "
              "session_end string")
STATE_SCHEMA = ("start long, end long, n long, total double, "
                "next_idx long")
_FMT = "%Y-%m-%d %H:%M:%S"


def _emit_row(user_id: int, idx: int, start: int, end: int, n: int,
              total: float) -> dict:
    return {"user_id": user_id, "session_idx": idx, "n_events": n,
            "total_value": round(total, 4),
            "session_start": dt.datetime.fromtimestamp(
                start, dt.timezone.utc).strftime(_FMT),
            "session_end": dt.datetime.fromtimestamp(
                end, dt.timezone.utc).strftime(_FMT)}


def _make_func(gap_minutes: int):
    gap = gap_minutes * 60

    def func(key, pdfs, state: GroupState):
        import pandas as pd
        user_id = int(key[0])
        if state.hasTimedOut:
            # watermark passed the open session's (end + gap): flush it
            # but KEEP the counter — state.remove() would restart a
            # returning user at session_idx 1 (duplicate keys, numbering
            # diverging from the batch sessionizer). The counter row
            # (n = 0) carries no timeout, so it never re-fires; the
            # per-user residue is one 5-field tuple, disclosed in the
            # module docstring.
            start, end, n, total, idx = state.get
            state.update((0, 0, 0, 0.0, idx + 1))
            if n > 0:
                yield pd.DataFrame(
                    [_emit_row(user_id, idx, start, end, n, total)])
            return
        ev = pd.concat(list(pdfs))
        # wall-clock epochs (parquet NTZ values; the batch twin reads
        # them under an UTC session so the epochs agree)
        secs = (ev["ts"].to_numpy().astype("datetime64[s]")
                .astype("int64"))
        vals = ev["value"].to_numpy()
        order = secs.argsort(kind="stable")
        secs, vals = secs[order], vals[order]
        if state.exists:
            start, end, n, total, idx = state.get
            if n == 0:
                start = None  # counter-only residue: no open session
        else:
            start, end, n, total, idx = None, 0, 0, 0.0, 1
        out = []
        for s, v in zip(secs.tolist(), vals.tolist()):
            if start is None:
                start, end, n, total = s, s, 1, float(v)
                continue
            if s - end > gap:
                out.append(_emit_row(user_id, idx, start, end, n, total))
                idx += 1
                start, end, n, total = s, s, 1, float(v)
            elif start - s > gap:
                # admitted-late event that predates the OPEN session by
                # more than the gap: the batch sessionizer makes it its
                # own earlier session — emit it now under the open
                # session's ordinal and shift the open session up one,
                # preserving chronological numbering. (Late data that
                # predates an ALREADY-EMITTED session cannot be
                # renumbered — inherent to streaming, disclosed.)
                out.append(_emit_row(user_id, idx, s, s, 1, float(v)))
                idx += 1
            else:
                # merge; an admitted-late event may precede the open
                # session's start — track the true min like the batch
                start = min(start, s)
                end = max(end, s)
                n += 1
                total += float(v)
        deadline_ms = (end + gap) * 1000
        if deadline_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed the trailing session's gap
            # (possible when this batch's events were all admitted-late)
            # — setting a timeout in the past would raise; flush now
            out.append(_emit_row(user_id, idx, start, end, n, total))
            state.update((0, 0, 0, 0.0, idx + 1))
        else:
            state.update((start, end, n, total, idx))
            # flush the trailing session once the watermark passes it
            state.setTimeoutTimestamp(deadline_ms)
        if out:
            yield pd.DataFrame(out)

    return func


def sessionize_stream(spark: SparkSession, input_dir: str,
                      checkpoint_dir: str, gap_minutes: int = 240,
                      watermark: str = "10 minutes",
                      query_name: str = "sessions"):
    """Run the file-source backlog to completion (availableNow) and
    materialize every FINALIZED session into the `query_name`
    in-memory table. A session finalizes when a later event of the
    same user opens the next one, or when the event-time timeout
    (watermark past end + gap) flushes the trailing session."""
    src = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(input_dir)
           .withWatermark("ts", watermark))
    sessions = (src.groupBy("user_id")
                .applyInPandasWithState(
                    _make_func(gap_minutes), OUT_SCHEMA, STATE_SCHEMA,
                    "append", GroupStateTimeout.EventTimeTimeout))
    q = (sessions.writeStream.format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
