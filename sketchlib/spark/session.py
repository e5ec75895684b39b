"""SparkSession helper tuned for sketch builds.

Settings rationale (scale notes, SURVEY.md §3.4):
* AQE on — runtime coalescing + skew-join splitting for the relational
  queries (it does NOT fix applyInPandas group skew; that's what
  sketchlib.spark.salt is for).
* Arrow batches of 10k rows — the unit the numpy kernels vectorize
  over (the reference's SIMD-era batch of 32, filter.go:184-186, is
  wrong for Arrow; SURVEY.md §2.1 #13).
* shuffle partitions default to cores (local) — on a real cluster set
  spark.sql.shuffle.partitions ≈ 2-3× total cores and rely on AQE
  coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sketchlib",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # parens matter: without them Python parses this as
    # `(shuffle_partitions or int(cpus)) if cpus.isdigit() else 32`,
    # silently discarding an explicit shuffle_partitions whenever
    # SPARK_GRAFT_CPUS is non-numeric (e.g. '*')
    shuffle = shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
