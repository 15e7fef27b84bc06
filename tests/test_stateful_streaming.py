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
