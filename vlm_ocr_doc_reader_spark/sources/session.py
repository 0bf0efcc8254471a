"""SparkSession factory with scale-oriented defaults.

AQE on (runtime partition coalescing + skew-join splitting), Arrow on (all
our UDFs are pandas/Arrow batched — never row-at-a-time Python), broadcast
threshold left at default so small dims broadcast automatically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(master: str | None = None,
              app_name: str = "vlm-ocr-doc-reader-spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
        "spark.sql.session.timeZone": "UTC",
        # X3 retry analog (ocr_client.py:261-345 3-attempt backoff): Spark
        # task-level retries replace app-level retry for deterministic UDFs
        "spark.task.maxFailures": "4",
        # at 100 TB: keep scan splits bounded so a partition fits in memory
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.driver.memory": "16g",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
