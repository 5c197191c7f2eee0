"""SparkSession factory tuned for the sandbox (local[N]) and documented for
cluster deployment (spark-submit --py-files lucenenet_spark.zip)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "lucenenet_spark", cpus: int | None = None,
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
        # let AQE re-plan (coalesce) the output partitioning of cached
        # plans: the segmented index is a cached DataFrame, and with the
        # default (false) every query over it schedules shuffle_partitions
        # tasks however tiny — at local[32] that is 32 near-empty tasks
        # per stage, pure scheduling overhead that grows with core count
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
