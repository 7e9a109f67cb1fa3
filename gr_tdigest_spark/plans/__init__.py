"""Spark session / plan helpers tuned for sketch workloads."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "SKETCH_CONFS"]

# Confs that matter for Arrow-vectorized sketch pipelines at scale:
# - AQE coalesces the tiny partial-sketch shuffle and splits skewed
#   reduce partitions (north_rule: skew handled explicitly).
# - Arrow batch size is the memory knob for the Python workers
#   (the analogue of the reference's allocator tuning, SURVEY §4).
SKETCH_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # sketch pipelines are execution-heavy (hash aggregates, sorts) and
    # their cached tables are incidental — don't let a big persisted
    # text table starve 32 concurrent hash-agg tasks of the protected
    # storage half (observed: SparkOutOfMemoryError in
    # UnsafeFixedWidthAggregationMap with a 26 GB cached transcript
    # table at the default storageFraction=0.5)
    "spark.memory.storageFraction": "0.3",
}


def get_spark(
    app: str = "gr-tdigest-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build a local SparkSession with sketch-tuned confs.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real
    cluster, submit with ``spark-submit --py-files gr_tdigest_spark.zip``
    and these confs instead.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    shuffle_partitions = shuffle_partitions or max(int(cores) * 2, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in SKETCH_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
