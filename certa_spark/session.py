"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100TB design point and are safe locally:
AQE on (runtime skew/coalesce handling), modest auto-broadcast
threshold, Arrow enabled for the pandas inference boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "certa-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master``/``shuffle_partitions`` default from env so the same code
    runs under the driver harness (local[$SPARK_GRAFT_CPUS]) and on a
    real cluster (master unset -> spark-submit decides).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: one shuffle partition per core; cluster deploys override
        # via spark.sql.adaptive.coalescePartitions anyway.
        shuffle_partitions = cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # deterministic cross-engine timestamp semantics: every session
        # is UTC from creation (the DuckDB oracles interpret naive
        # timestamps as UTC), and nanos-precision parquet reads as
        # bigint. Setting these HERE (not as a side effect inside a
        # query helper) keeps query results order-independent.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # model-inference batch size at the Arrow boundary (UD1);
        # reference batches are tiny (4/8) because of GPU memory — Arrow
        # batches are cheap, keep them large for throughput.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
