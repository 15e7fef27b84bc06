"""Custom stateful streaming operators (applyInPandasWithState).

The reference needs no streaming state (SURVEY §2.10); these are the
engine-side stateful building blocks a production crawl ingest wants:

* ``streaming_dedup`` — exactly-once-per-url emission across
  micro-batches: per-url GroupState remembers the first-seen content
  digest; later arrivals for the same url are dropped (re-crawls) or
  emitted as changed (digest differs), with a processing-time timeout
  to bound state.
* ``streaming_sessions`` — gap-based sessionization (the streaming twin
  of the batch ``event_sessions`` query): per-user GroupState carries
  the open session; each update to a session re-emits its current row
  (update semantics — a sink keyed on (user_id, session_id) keeps the
  last), so bounded replays converge to exactly the batch cumsum
  segmentation (tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

_OUT = StructType([
    StructField("url", StringType()),
    StructField("digest", StringType()),
    StructField("status", StringType()),  # new | changed
])
_STATE = StructType([StructField("digest", StringType())])


def _make_dedup_fn(state_ttl_ms: int | None):
    def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        url = key[0]
        if state_ttl_ms and state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            for digest in pdf["digest"]:
                if seen is None:
                    out.append((url, digest, "new"))
                    seen = digest
                elif digest != seen:
                    out.append((url, digest, "changed"))
                    seen = digest
                # identical re-crawl → suppressed
        state.update((seen,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=["url", "digest", "status"])

    return _dedup_fn


_SESS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("n_events", LongType()),
    StructField("duration_secs", LongType()),
])
_SESS_STATE = StructType([
    StructField("session_id", LongType()),
    StructField("start_epoch", LongType()),
    StructField("last_epoch", LongType()),
    StructField("n_events", LongType()),
])


def _make_sessions_fn(gap_secs: int):
    def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        user = key[0]
        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 0, None, None, 0
        rows = []
        for pdf in pdfs:
            for _, r in pdf.sort_values(["epoch", "event_id"]).iterrows():
                e = int(r["epoch"])
                if last is None:
                    sid, start, last, n = 1, e, e, 1
                elif e - last > gap_secs:
                    sid, start, last, n = sid + 1, e, e, 1
                else:
                    last, n = e, n + 1
                rows.append((user, sid, n, last - start))
        state.update((sid, start, last, n))
        if rows:
            # update semantics: only the LAST row per session matters;
            # emit just those to keep sink traffic proportional to
            # sessions touched, not events seen
            out = pd.DataFrame(
                rows, columns=["user_id", "session_id", "n_events",
                               "duration_secs"])
            yield out.groupby(["user_id", "session_id"], as_index=False).last()

    return _fn


def streaming_sessions(events_stream: DataFrame,
                       gap_secs: int = 1800) -> DataFrame:
    """Event stream → per-(user, session) rows under gap-based
    segmentation; events must carry (user_id, event_id, ts).

    Within-batch order is (ts, event_id) — the batch query's window
    order — so a bounded replay converges to exactly the batch
    segmentation when the sink keeps the last row per key.
    """
    ev = events_stream.select(
        "user_id", "event_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("epoch"))
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _make_sessions_fn(gap_secs), _SESS_OUT, _SESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def streaming_dedup(pages_stream: DataFrame,
                    state_ttl_ms: int | None = None) -> DataFrame:
    """Stream of pages → stream of first-seen/changed url events.

    ``state_ttl_ms`` bounds per-url state on a long-running cluster job
    (ProcessingTimeTimeout). Leave None for availableNow/drain-style
    runs: a processing-time timeout keeps the micro-batch engine
    scheduling timeout-evaluation batches, which prevents availableNow
    queries from terminating promptly.
    """
    digests = pages_stream.select(
        "url", F.md5(F.col("text")).alias("digest"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms
               else GroupStateTimeout.NoTimeout)
    return (
        digests.groupBy("url")
        .applyInPandasWithState(
            _make_dedup_fn(state_ttl_ms), _OUT, _STATE,
            outputMode="append",
            timeoutConf=timeout)
    )
