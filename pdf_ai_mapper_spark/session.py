"""SparkSession factory with the engine's physical-execution defaults.

Pinned for determinism + oracle comparability:
- session timezone UTC (DuckDB timestamps are UTC-naive),
- Arrow enabled for all pandas-UDF stages, bounded batch size
  (payload columns are large — a 10k-row Arrow batch of 50 KB pages
  is 500 MB; we cap records per batch instead),
- AQE on (runtime coalescing + skew-join splitting at scale),
- shuffle partitions sized to the local core count (on a real
  cluster this is set per-job or left to AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG, EngineConfig


def get_spark(app_name: str = "pdf-ai-mapper-spark",
              master: str | None = None,
              cfg: EngineConfig = DEFAULT_CONFIG,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(cfg.arrow_max_records_per_batch))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
