"""SparkSession construction with the engine's scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every setting
here is chosen to be correct at both scales:

- AQE on (runtime partition coalescing + skew-join splitting),
- shuffle partitions sized to cores locally (overridable; a real cluster
  would size to 2-3x total cores),
- Arrow enabled with a bounded batch size so ``bytes`` columns flowing
  through pandas UDFs cannot blow executor memory (SURVEY.md §4.3).
  Default 1024 rows/batch: measured on this host, the descriptor kernel's
  per-batch working set then stays cache-resident under full-core worker
  concurrency — 3.4x faster at 32 workers than the 8192-row setting
  (335k vs 99k rows/s); per-batch fixed overhead is already amortized at
  1024. Raise it only for narrow all-numeric rows,
- session timezone pinned UTC so timestamps survive the pandas/DuckDB
  boundary bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "profet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 1024,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None``: under spark-submit (detected via the
    ``PYSPARK_GATEWAY_PORT`` env var the launcher JVM sets for its
    Python child) the builder sets NO master, so spark-submit's
    ``--master yarn/k8s/local[N]`` choice applies — forcing a local
    master here would silently downgrade a cluster job to single-node.
    Outside spark-submit it defaults to ``local[$SPARK_GRAFT_CPUS or
    *]`` (the sandbox/test shape).
    """
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = max(8, min(64, n))

    b = SparkSession.builder.appName(app)
    if master is not None:
        b = b.master(master)
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PROFET_DRIVER_MEM", "8g"))
        # 1 task = 1 core: a threaded BLAS inside a Python worker only
        # steals cycles from the other workers on the host. Measured 3x
        # kernel aggregate at 32 workers (text_descriptors._pin_blas_threads,
        # which also enforces this at runtime when the env is absent).
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
