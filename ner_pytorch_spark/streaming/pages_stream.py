"""Structured Streaming ingestion: pages stream → mentions stream.

The reference has no streaming (SURVEY §2.10) and the north rule is
batch-oriented (snapshot checkpoint/resume = incremental reads between
snapshots), so this module is the OPTIONAL streaming mode: the
sentence-windowing and tagging stages are stateless per row, so they
lift directly onto ``readStream`` with no state store; the only
stateful piece offered is a watermarked per-window mention count
(late-data-tolerant monitoring aggregate).

Tested with the file source + ``availableNow`` trigger (kafka isn't in
the sandbox; the plan is source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spans import mentions_table
from ..operators.tagger import sentences_table, tag_sentences

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of pages parquet drops."""
    return spark.readStream.schema(PAGES_DDL).parquet(path)


def mentions_stream(pages: DataFrame, aliases: list[dict]) -> DataFrame:
    """Stateless pages→mentions transformation lifted onto a stream.

    Identical operators to the batch plan — sentences_table and
    tag_sentences are row-local, so the streaming micro-batch plan
    reuses them verbatim.
    """
    sents = sentences_table(pages)
    tagged = tag_sentences(sents, mode="gazetteer", aliases=aliases)
    return mentions_table(tagged)


def windowed_mention_counts(
    pages: DataFrame, aliases: list[dict],
    window: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time aggregate: mentions per (window, tag_type).

    Demonstrates late-data handling on warc_ts; state is bounded by the
    watermark.
    """
    sents = sentences_table(pages.withWatermark("warc_ts", watermark),)
    # carry event time through the tagger by re-joining on url
    tagged = tag_sentences(sents, mode="gazetteer", aliases=aliases)
    mentions = mentions_table(tagged)
    with_ts = mentions.join(
        pages.select("url", "warc_ts").withWatermark("warc_ts", watermark),
        on="url")
    return (
        with_ts.groupBy(F.window("warc_ts", window), "tag_type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def run_to_sink(
    stream_df: DataFrame, out_path: str, checkpoint: str,
    mode: str = "append",
):
    """availableNow file-sink runner (processes all pending input, stops)."""
    return (
        stream_df.writeStream
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
