"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app: str = "dd_ops_ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "24g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Standard session: AQE on, Arrow on, shuffle partitions ~= cores.

    ``cores=None`` -> local[*]. In local mode the driver is the only JVM, so
    ``spark.driver.memory`` is the one memory knob that matters.
    """
    if cores is None:
        cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # swept 128..20000 on the flagship kernel at sf0.1/local[32]:
        # 128-768 all ~3.3s, 2048 = 3.8s, 10000 = 5.3s. Small batches
        # pipeline the JVM Arrow producer with the Python kernel and keep
        # the kernel's working set cache-resident; 512 docs x ~160 spans
        # also keeps tail-doc batches (~4.4k spans/doc) bounded.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # Python DataSource scans (operators/warcsource.py): without
        # this, a reader that implements pushFilters() raises at plan
        # time rather than degrading to a post-scan filter
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
