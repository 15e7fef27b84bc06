"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

At 100 TB the same fact-to-fact join (e.g. mentions ⋈ links on
(url, sent_id), lineitem ⋈ orders on orderkey) re-shuffles both sides
every run. Writing both sides bucketed on the join key — same bucket
count, sorted within buckets — lets every subsequent join run with ZERO
Exchange nodes: Spark aligns bucket files one-to-one (plan-audited in
tests). This is the Spark-native equivalent of the reference engine
keeping co-partitioned on-disk layouts.

Bucketing uses the table catalog (``bucketBy`` requires
``saveAsTable``); ``path`` makes the table external so data lives where
the caller wants it, not in the default warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame, table: str, n_buckets: int, bucket_cols: list[str],
    sort_cols: list[str] | None = None, path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on the join key."""
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, *bucket_cols)
              .sortBy(*(sort_cols or bucket_cols))
              .format("parquet"))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a bare
    ``read.parquet`` of the same files would lose it and re-shuffle)."""
    return spark.table(table)
