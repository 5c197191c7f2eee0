"""SparkSession factory tuned for the sandbox (local[N]) and documented for
cluster deployment (spark-submit --py-files lucenenet_spark.zip)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    """Shuffle/spill scratch space.  Default to tmpfs when it has real
    capacity: shuffle files on a RAM disk take co-tenant disk contention
    (and our own fsync latency) out of the hot path — the single-node
    analogue of putting spark.local.dir on node-local NVMe, which is what
    a real cluster deployment should set.  SPARK_GRAFT_LOCAL_DIR wins."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize > 16 << 30:
            d = "/dev/shm/lucenenet_spark_local"
            os.makedirs(d, exist_ok=True)
            return d
    except OSError:
        pass
    return "/tmp"


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
        # Heap scales with parallelism (constant memory PER CORE, capped
        # to leave room for tmpfs shuffle + python workers): local[N]
        # emulates an N-core cluster, and a 4N-executor cluster has 4N x
        # the memory.  A fixed heap at rising core counts makes the live
        # set (N concurrent tasks' working data) grow against constant
        # headroom — measured: GC inflated build CPU 1.4x at 8 cores
        # under a fixed 8g heap, erasing the 2->8 scaling the kernels
        # deliver (tools/profile_build.py, BENCH/BASELINE.md).
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM",
                               f"{min(64, max(8, (5 * cpus) // 2))}g"))
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
