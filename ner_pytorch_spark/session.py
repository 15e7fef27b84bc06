"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (one JVM); the same settings are
what we would ship to a multi-executor cluster via ``spark-submit
--py-files`` — AQE for runtime re-planning (skew-join splitting, dynamic
partition coalescing), Arrow for the pandas-UDF inference stage, and a
shuffle-partition count sized to the core count rather than the 200
default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ner_pytorch_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver convention) or
    all local cores. ``shuffle_partitions`` defaults to ``cores`` —
    at cluster scale this would instead be sized from input bytes /
    target partition size; AQE coalesces the excess either way.
    """
    # One BLAS thread per python worker: N workers × M BLAS threads
    # oversubscribes the box and DESTROYS scaling of the UDF stage.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    # Scan split size (guide §6): scale-dependent, so env-parameterised.
    # The local default (16m) exists because driver testdata ships as
    # ONE file per table with few row groups — a 128m split reads the
    # whole 126 MB lineitem serially in one task. On a real cluster with
    # many-file inputs set SPARK_GRAFT_MAX_PARTITION_BYTES to 128m-1g
    # (large sequential scans want FEWER, larger splits; §2.2/§6).
    max_split = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", max_split)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Inference-stage batch sizing: bounds peak memory of the
        # pandas-UDF tagger (padded [B, L] tensors) independently of
        # partition row counts (SURVEY §4: explicit partition sizing
        # for the inference stage).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
