"""SparkSession factory tuned for this engine.

Local mode stands in for the multi-executor cluster (BASELINE.md scaling
evidence runs the same job at local[N] vs local[4N]); on a real cluster the
same configs apply, plus Iceberg catalog configs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "incremental-entity-extraction",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # idempotent batch re-runs: overwrite only the batch_id partitions
        # being written (resume semantics, SURVEY.md §2.10)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Round 8: warm the Python worker pool AT SESSION CREATION, not just
    # where a caller remembers to (warm_python_workers docstring: a real
    # cluster pays the per-worker import storm once at executor startup, so
    # it is not a per-operator cost) — previously only the pipeline bench
    # legs warmed, and the first Python-stage query of any other session
    # paid the 32-worker storm inside its own wall.  Idempotent per
    # SparkContext (application-id guard), so repeat get_spark calls and
    # the bench's explicit warm_python_workers cost one no-op check.
    warm_python_workers(spark)
    return spark


_WARMED_APPS: set = set()


def warm_python_workers(spark: SparkSession, waves: int = 2) -> None:
    """Warm the Python-worker pool before timing a benchmark.

    Local mode forks one Python daemon worker per core; the first task each
    worker runs pays the numpy/pandas/pyarrow import storm (all workers
    importing simultaneously contend on CPU — ~20s at 32 workers vs ~3s
    steady-state for the same job).  A real cluster pays this once at
    executor startup, so benchmarks exclude it by running one trivial
    Arrow-UDF wave per worker first.  One warm per SparkContext: repeat
    calls (e.g. get_spark already warmed this session) return immediately.
    """
    import pandas as pd  # noqa: F401

    app_id = spark.sparkContext.applicationId
    if app_id in _WARMED_APPS:
        return
    _WARMED_APPS.add(app_id)
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(cores * waves).repartition(cores * waves)

    def _touch(batches):
        # force the heavy imports the pipeline UDFs need
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        import incremental_entity_extraction_spark.functions.featurizer  # noqa: F401

        for pdf in batches:
            yield pdf

    df.mapInPandas(_touch, schema="id long").count()
