"""SparkSession factory with scale-appropriate defaults.

Tests/bench run on local[N]; production ships via spark-submit --py-files
(BASELINE.json north_rule), where master/shuffle-partitions come from the
cluster conf and these builder calls are no-ops for already-set keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "find-that-charity-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Defaults follow the sandbox contract: ``local[$SPARK_GRAFT_CPUS]`` and
    ``spark.sql.shuffle.partitions=32``. AQE stays on (runtime coalescing +
    skew-join splitting); Arrow is on for every pandas-UDF boundary.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
