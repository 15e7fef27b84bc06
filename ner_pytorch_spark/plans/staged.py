"""Shared machinery for checkpoint-resumable, snapshot-staged plans.

Both multi-stage plans in this package — :class:`~.kg_pipeline.KGPipeline`
(pages → triples, the north rule) and
:class:`~.corpus_prep.CorpusPrepPipeline` (raw docs → training-ready
corpus) — commit every stage through a :class:`~.catalog.SnapshotCatalog`
and append per-stage metrics plus per-partition lineage rows, so a run
can resume from the last committed snapshot after a failure and an
auditor can replay where every row count came from (north rule:
"resumable from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SnapshotCatalog


def _partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts — the lineage record for one stage."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(stage).alias("stage"),
                F.col("_pid").alias("partition_id"), "n_rows")
    )


class SnapshotStagedPlan:
    """Base: snapshot-committed stages with metrics + lineage rows."""

    def __init__(self, spark: SparkSession, catalog_root: str):
        self.spark = spark
        self.catalog = SnapshotCatalog(spark, catalog_root)

    # ------------------------------------------------------------ util
    def _metric(self, stage: str, n_rows: int, seconds: float) -> None:
        m = self.spark.createDataFrame(
            [(stage, n_rows, float(seconds))],
            "stage string, n_rows long, seconds double")
        self.catalog.append_rows("_metrics", m)

    def _stage(self, name: str, resume: bool, build) -> DataFrame:
        """Run one stage unless its snapshot already exists (resume).

        Post-commit bookkeeping costs ONE action: the per-partition
        lineage rows are collected (small — one row per partition) and
        the stage's metric row count is their sum, instead of a separate
        ``count()`` pass over the snapshot.
        """
        if resume and self.catalog.exists(name):
            return self.catalog.read(name)
        t0 = time.time()
        df = build()
        self.catalog.commit(name, df)
        out = self.catalog.read(name)
        lineage = _partition_lineage(out, name).collect()
        self._metric(name, sum(r["n_rows"] for r in lineage),
                     time.time() - t0)
        self.catalog.append_rows("_lineage", self.spark.createDataFrame(
            lineage, "stage string, partition_id int, n_rows long"))
        return out
