"""SparkSession factory with the engine's standard configuration.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime coalescing + skew-join splitting replaces the
  reference's hand-tuned batch sizes (guac's flush@5000,
  /root/reference/pkg/ingestor/ingestor.go:119).
- shuffle partitions default to cores locally; on a real cluster this
  is set to ~2-3× total cores via spark-submit conf, and AQE coalesces.
- UTC session timezone so results compare bit-exactly with the DuckDB
  oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "guackg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("GUACKG_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = int(os.environ.get("GUACKG_SHUFFLE_PARTITIONS", n))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("GUACKG_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
