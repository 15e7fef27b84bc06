"""applyInPandasWithState: cross-micro-batch url dedup.

One streaming query, maxFilesPerTrigger=1 → each input file becomes its
own micro-batch, so state genuinely carries across batches without
paying a second query startup.
"""

import datetime as dt


def test_streaming_dedup(spark, tmp_path):
    from ner_pytorch_spark.streaming.pages_stream import PAGES_DDL
    from ner_pytorch_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2024, 1, 1)

    def write_batch(rows, subdir):
        spark.createDataFrame(rows, PAGES_DDL).coalesce(1) \
            .write.parquet(f"{src}/{subdir}")

    # batch 1: two urls; batch 2: identical re-crawl, change, new url
    write_batch([("u1", ts, b"", "hello", "en"),
                 ("u2", ts, b"", "world", "en")], "b1")
    write_batch([("u1", ts, b"", "hello", "en"),
                 ("u2", ts, b"", "world v2", "en"),
                 ("u3", ts, b"", "fresh", "en")], "b2")

    stream = (spark.readStream.schema(PAGES_DDL)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = (streaming_dedup(stream).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = {(r.url, r.status) for r in spark.read.parquet(out).collect()}
    assert ("u1", "new") in rows and ("u2", "new") in rows
    assert ("u3", "new") in rows
    assert ("u2", "changed") in rows
    assert ("u1", "changed") not in rows  # identical re-crawl suppressed


class _FakeState:
    def __init__(self, tup=None):
        self._t = tup

    @property
    def exists(self):
        return self._t is not None

    @property
    def get(self):
        return self._t

    def update(self, tup):
        self._t = tup


def _run_fn(fn, state, rows_chunks):
    import pandas as pd

    out = list(fn((1,), (pd.DataFrame(c, columns=["epoch", "event_id"])
                         for c in rows_chunks), state))
    return (pd.concat(out, ignore_index=True) if out else
            pd.DataFrame(columns=["user_id", "session_id", "n_events",
                                  "duration_secs"]))


def test_dedup_fn_vectorized_semantics():
    """Direct group-fn check for the run-compression dedup: first-seen
    → new, changes → changed, identical re-crawls suppressed, state
    carries the last digest across batches."""
    import pandas as pd

    from ner_pytorch_spark.streaming.stateful import _make_dedup_fn

    fn = _make_dedup_fn(None)

    def run(state, chunks):
        out = list(fn(("u1",), (pd.DataFrame({"digest": c})
                                for c in chunks), state))
        return ([] if not out else
                list(pd.concat(out, ignore_index=True)
                     .itertuples(index=False, name=None)))

    st = _FakeState()
    rows = run(st, [["a", "a", "b"], ["b", "c"]])
    assert rows == [("u1", "a", "new"), ("u1", "b", "changed"),
                    ("u1", "c", "changed")]
    assert st.get == ("c",)
    # next batch: identical re-crawl fully suppressed, state kept
    assert run(st, [["c", "c"]]) == []
    assert st.get == ("c",)
    # change after the seam
    assert run(st, [["a"]]) == [("u1", "a", "changed")]
    assert run(st, []) == [] and st.get == ("a",)


def test_sessions_fn_vectorized_semantics():
    """Direct group-fn check: multi-chunk out-of-order input, carried
    open-session continuation, and new-session splits all reproduce the
    scalar-reference segmentation."""
    from ner_pytorch_spark.streaming.stateful import _make_sessions_fn

    fn = _make_sessions_fn(1800)
    # batch 1 from empty state: chunks arrive out of order
    st = _FakeState()
    out = _run_fn(fn, st, [[(2100, 3)], [(0, 1), (100, 2)]])
    got = {(r.session_id, r.n_events, r.duration_secs)
           for r in out.itertuples()}
    assert got == {(1, 2, 100), (2, 1, 0)}
    assert st.get == (2, 2100, 2100, 1)
    # batch 2 continues session 2 across the seam, then opens session 3
    out = _run_fn(fn, st, [[(2200, 4), (10000, 5)]])
    got = {(r.session_id, r.n_events, r.duration_secs)
           for r in out.itertuples()}
    assert got == {(2, 2, 100), (3, 1, 0)}
    assert st.get == (3, 10000, 10000, 1)
    # empty batch leaves state intact
    out = _run_fn(fn, st, [])
    assert len(out) == 0 and st.get == (3, 10000, 10000, 1)


def test_sessions_fn_hot_key_not_per_event_python():
    """≥100k-event single-key micro-batch: the vectorized segmentation
    must be far from per-event-Python cost (the old iterrows loop took
    tens of seconds here; cumsum does it in milliseconds — the 2 s
    bound leaves 100x headroom against CI noise)."""
    import time

    import numpy as np

    from ner_pytorch_spark.streaming.stateful import _make_sessions_fn

    rng = np.random.default_rng(0)
    n = 200_000
    gaps = rng.integers(1, 60, size=n)
    gaps[rng.random(n) < 0.001] = 4000       # ~200 session breaks
    epochs = np.cumsum(gaps)
    rows = list(zip(epochs.tolist(), range(n)))
    fn = _make_sessions_fn(1800)
    st = _FakeState()
    t0 = time.time()
    out = _run_fn(fn, st, [rows])
    secs = time.time() - t0
    assert int(out["n_events"].sum()) == n
    assert (out["session_id"].to_numpy()
            == np.arange(1, len(out) + 1)).all()
    assert secs < 2.0, secs


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Gap sessionization: the streaming stateful operator (update
    semantics, last row per (user, session)) converges to exactly the
    batch cumsum segmentation over the same bounded event set, with
    sessions spanning micro-batch boundaries."""
    from ner_pytorch_spark.streaming.stateful import streaming_sessions

    EV_DDL = "user_id long, event_id long, ts timestamp"
    base = dt.datetime(2024, 1, 1)

    def t(secs):
        return base + dt.timedelta(seconds=secs)

    src = str(tmp_path / "ev")
    b1 = [(1, 1, t(0)), (1, 2, t(100)), (1, 3, t(2100)), (2, 1, t(50))]
    b2 = [(1, 4, t(2200)), (1, 5, t(10000)), (2, 2, t(60))]
    spark.createDataFrame(b1, EV_DDL).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(b2, EV_DDL).coalesce(1).write.parquet(f"{src}/b2")

    stream = (spark.readStream.schema(EV_DDL)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = (streaming_sessions(stream, gap_secs=1800).writeStream
         .format("memory").queryName("sess_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = spark.sql("select * from sess_out").collect()
    final = {}
    for r in rows:  # last update per session == max n_events
        k = (r.user_id, r.session_id)
        if k not in final or r.n_events > final[k][0]:
            final[k] = (r.n_events, r.duration_secs)
    assert final == {
        (1, 1): (2, 100),    # events at 0, 100
        (1, 2): (2, 100),    # 2100, 2200 — session spans the batch seam
        (1, 3): (1, 0),      # 10000
        (2, 1): (2, 10),     # 50, 60
    }
