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
        self._pending_metrics: list[tuple] = []
        self._pending_lineage: list[tuple] = []
        self._temp_persists: list[DataFrame] = []

    # ------------------------------------------------------------ util
    def _metric(self, stage: str, n_rows: int, seconds: float) -> None:
        self._pending_metrics.append((stage, int(n_rows), float(seconds)))

    def _stage(self, name: str, resume: bool, build) -> DataFrame:
        """Run one stage unless its snapshot already exists (resume).

        Post-commit bookkeeping costs ONE action: the per-partition
        lineage rows are collected (small — one row per partition) and
        the stage's metric row count is their sum, instead of a separate
        ``count()`` pass over the snapshot. Metric/lineage rows are
        BUFFERED and written once per run (``_flush_bookkeeping``): the
        parquet catalog's append re-reads and re-writes the whole table,
        so one append per stage per table cost ~14 grow-and-rewrite jobs
        per pipeline run. The snapshots themselves still commit per
        stage — resumability (catalog.exists) is unaffected; only the
        audit rows of a crashed run's completed stages are deferred.
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
        self._pending_lineage.extend(
            (name, int(r["partition_id"]), int(r["n_rows"]))
            for r in lineage)
        return out

    def _flush_bookkeeping(self) -> None:
        """Write buffered metric/lineage rows (one append per table) and
        release any stage-internal persisted intermediates."""
        if self._pending_metrics:
            self.catalog.append_rows("_metrics", self.spark.createDataFrame(
                self._pending_metrics,
                "stage string, n_rows long, seconds double"))
            self._pending_metrics = []
        if self._pending_lineage:
            self.catalog.append_rows("_lineage", self.spark.createDataFrame(
                self._pending_lineage,
                "stage string, partition_id int, n_rows long"))
            self._pending_lineage = []
        for df in self._temp_persists:
            df.unpersist(blocking=False)
        self._temp_persists = []
