"""SparkSession factory with the engine's standard configuration.

Defaults are chosen for the 100 TB design point and verified at local scale:
AQE (runtime re-planning + skew-join splitting), Arrow-batched Python UDFs
with a bounded batch size (the Python-worker memory analog of the reference's
provider batch size, gemini.py:32), and explicit shuffle parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from chatvector_ai_spark.config import ARROW_MAX_RECORDS_PER_BATCH, SHUFFLE_PARTITIONS


def get_spark(
    app_name: str = "chatvector-ai-spark",
    master: str | None = None,
    shuffle_partitions: int = SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Local-mode JVM heap: Spark's 1g default starves a 32-slot local
        # session — the parquet MemoryManager pool (0.95 × heap) throttles
        # row-group sizes under concurrent bucketed writers (the "Total
        # allocation exceeds 95%" warnings in the round-4 bench log) and
        # hash aggregations spill early. Only applied for local masters
        # and only when the caller didn't set it; a real cluster sizes
        # driver/executor memory in the spark-submit conf instead.
        **(
            {"spark.driver.memory": os.getenv("CVS_DRIVER_MEMORY", "12g")}
            if (master or "").startswith("local")
            and "spark.driver.memory" not in (extra_conf or {})
            else {}
        ),
        # Shuffle/spill on tmpfs when available: the sandbox's single shared
        # disk is a hard serial floor for shuffle-heavy stages (measured:
        # link stage 20→14 s). On a real cluster leave SPARK_LOCAL_DIRS to
        # the NVMe-backed default (CVS_TMPFS_SHUFFLE=0 disables).
        **(
            {"spark.local.dir": "/dev/shm/cvs-spark-local"}
            if os.path.isdir("/dev/shm")
            and os.access("/dev/shm", os.W_OK)
            and os.environ.get("CVS_TMPFS_SHUFFLE", "1") != "0"
            and "SPARK_LOCAL_DIRS" not in os.environ
            else {}
        ),
        # Arrow UDF transfers allocate netty DIRECT memory per concurrent
        # stream; the JVM default cap (1 GiB) OOMs with 32 task slots ×
        # 16 MiB arrow buffers. Scale the cap with local core count; on a
        # real cluster this is per-executor and set by the submit conf.
        "spark.driver.extraJavaOptions": "-XX:MaxDirectMemorySize=8g",
        "spark.executor.extraJavaOptions": "-XX:MaxDirectMemorySize=8g",
        # zstd over the default snappy: ~16% fewer bytes per snapshot, and
        # on this box the write path is memory-bandwidth-bound, not
        # CPU-bound — trading compression CPU (which scales with cores)
        # for bytes moved (which doesn't) measured 1.4-2x faster commits
        # of the 10M-row mention table at both 8 and 32 cores. The same
        # trade holds on real clusters: zstd is the standard lake codec.
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(ARROW_MAX_RECORDS_PER_BATCH),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
