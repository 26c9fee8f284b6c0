"""SparkSession factory tuned for the KG-construction pipeline.

Local-mode settings stand in for cluster settings; every knob here is
one we would set identically (with different values) on a real
multi-executor cluster:

* AQE on — runtime coalescing + skew-join splitting for the
  canonicalization self-joins (SURVEY.md §4).
* Arrow on — the extraction stage is Arrow-vectorized pandas batches;
  row-at-a-time Python never touches the hot path.
* shuffle.partitions sized to cores at test scale; a 1000-executor run
  would size this to ~2-3x total cores.
* Arrow maxRecordsPerBatch stays at the 10k default: benchmarking showed
  2k batches double extraction wall time at local[32] (more Python
  round-trips per partition); lower it per-job only for multi-MB binary
  blobs (see multimodal.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "tortank-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
