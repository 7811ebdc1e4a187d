"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]`` (single JVM); the same settings are
what we would ship in ``spark-submit --conf`` for a multi-executor
cluster — nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "fcrepo3-rdf-extractor-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or default_parallelism()
    # shuffle partitions sized to the executor slots; AQE coalesces
    # further at runtime so oversizing is cheap, undersizing is not
    shuffle = shuffle_partitions or max(cores * 2, 16)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch memory: FOXML blobs can be ~100 KB each, so
        # 1024 rows/batch keeps a batch O(100 MB) worst-case per task
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # 128 MB input splits — the knob that sets extraction task
        # granularity at 100 TB (≈800k tasks, fine for a 1000-exec cluster)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
