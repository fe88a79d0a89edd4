"""SparkSession factory.

The same settings we would ship for a 1000-executor cluster, minus
cluster-manager specifics: AQE on (runtime shuffle-partition coalescing and
skew-join splitting), UTC session timezone (deterministic date/epoch
semantics vs the DuckDB oracle), Arrow enabled for the Pandas-UDF /
mapInArrow paths, and a shuffle-partition default sized for local[32]
(on a real cluster AQE coalesces from a higher initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "shardpack_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce by target size, not by keeping defaultParallelism tasks:
        # small shuffles collapse to few partitions (less task overhead);
        # large shuffles still split by advisory size.  This is the
        # Spark-docs-recommended setting (default true only for back-compat).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # With parallelismFirst off, this is the coalesce target.  The
        # 64 MB default is sized for I/O-bound scans; CPU-heavy analytic
        # stages (windows, multi-way joins) on modest shuffles would
        # collapse to 1-2 tasks.  8 MB keeps those parallel while still
        # coalescing away empty partitions; deployments with large
        # shuffles should raise it via SPARK_GRAFT_ADVISORY_PARTITION.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); read as long and convert
        # in tables.load_table (Spark has no nanos timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # enable pushFilters() on Python data sources (shardpack key pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # static conf: managed-table location for bucketed-join tests/jobs
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/shardpack_spark_warehouse"))
    )
    return builder.getOrCreate()
