"""Custom stateful streaming operators (applyInPandasWithState).

The reference needs no streaming state (SURVEY §2.10); these are the
engine-side stateful building blocks a production crawl ingest wants:

* ``streaming_dedup`` — exactly-once-per-url emission across
  micro-batches: per-url GroupState remembers the first-seen content
  digest; later arrivals for the same url are dropped (re-crawls) or
  emitted as changed (digest differs), with a processing-time timeout
  to bound state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (StringType, StructField, StructType)

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
