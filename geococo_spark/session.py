"""SparkSession factory with the engine's tuned defaults.

Tuning rationale (100 TB target, tested on local[N]):
- AQE on (runtime coalesce + skew-join splitting backs up the engine's
  explicit salting, SURVEY.md §4.2),
- Arrow enabled and batch-size bounded so decoded-image batches fit in
  executor memory (SURVEY.md §4.2 codegen row),
- shuffle partitions default to cores on local mode; a real cluster
  would size this to ~2-3x total cores / target 128-256 MB partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geococo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 64,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = cores if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image rows are fat (bytes column); keep Arrow batches small so a
        # batch of decoded uint8 arrays stays well under executor memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
