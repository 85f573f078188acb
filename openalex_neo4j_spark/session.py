"""SparkSession construction — no module-level session (spark-submit-able).

Scale posture: these configs are what we would ship to a 1000-executor
cluster; local[N] is only the sandbox stand-in. AQE handles runtime
coalescing and skew-join splitting; shuffle partitions default to a
cluster-ish value and AQE coalesces down at small SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openalex-neo4j-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sized for heavy rows: pages.html is 15-50KB, so 10k-row arrow
        # batches would be 150-500MB allocations per in-flight task
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # pages.html rows are tens of KB; the 4096-row default columnar
        # batch can overflow the on-heap column vector on binary columns
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # disk blocks (shuffle + checkpoint) larger than this are read
        # via FileChannel.map; with tens of concurrent readers on one
        # kernel the mmap/munmap syscalls serialize on the address-space
        # lock (thread dumps: map0/unmap0 storms, 95% sys time).
        # Streaming reads sidestep it entirely; on a real cluster each
        # executor host has its own kernel so either setting works.
        .config("spark.storage.memoryMapThreshold", "2g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
