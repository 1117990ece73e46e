"""SparkSession factory tuned for the engine.

Defaults are chosen for scale-out correctness first (AQE on, skew-join
handling on, Arrow for the Python boundary) and are safe on ``local[*]``.
On a real cluster the same flags let AQE pick shuffle parallelism and
handle skew at runtime, which is the 100 TB-safe default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine defaults. Anything the caller sets explicitly wins.
_ENGINE_CONFS = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones. This is what makes a fixed shuffle.partitions setting survive a
    # 100x scale-up.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp semantics regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Local-mode shuffle parallelism; AQE coalesces below this at runtime.
    "spark.sql.shuffle.partitions": "32",
    # Keep partition input sizes bounded so a 100 TB scan parallelizes.
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "beam_spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in _ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
