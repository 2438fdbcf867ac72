"""SparkSession factory with scale-appropriate defaults.

Tests/bench run on local[N]; production ships via spark-submit --py-files
(BASELINE.json north_rule), where master/shuffle-partitions come from the
cluster conf and these builder calls are no-ops for already-set keys.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PYFILES_SENT: set[str] = set()


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Our pandas UDFs are pickled by module reference, so workers must be
    able to import ``find_that_charity_spark`` regardless of the driver's
    cwd. This is the same mechanism as ``spark-submit --py-files
    ftc_engine.zip`` (BASELINE.json north_rule); under spark-submit the
    call is a harmless no-op re-add."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PYFILES_SENT:
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tempfile.gettempdir(), f"ftc_engine_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(root, "find_that_charity_spark")
            for dirpath, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _PYFILES_SENT.add(app_id)


def get_spark(
    master: str | None = None,
    app_name: str = "find-that-charity-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Defaults follow the sandbox contract: ``local[$SPARK_GRAFT_CPUS]`` and
    ``spark.sql.shuffle.partitions=32``. AQE stays on (runtime coalescing +
    skew-join splitting); Arrow is on for every pandas-UDF boundary.

    Under ``spark-submit --master ...`` the submitted master wins: the
    builder must NOT call .master() or a cluster job would silently run
    local (spark.master arrives via system properties in SparkConf).
    """
    if master is None:
        from pyspark import SparkConf

        submitted = SparkConf().get("spark.master", None) or os.environ.get("MASTER")
        if submitted is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # UDF-heavy scans (tokenize) underutilize executors with the 128 MB
        # default split size: a small corpus yields fewer map tasks than
        # cores, and the whole stage is then split-bound. 32 MB keeps map
        # parallelism >= cores at every measured scale and is still coarse
        # enough at 100 TB (~3M map tasks).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"),
        )
    )
    # arbitrary per-run conf overrides (experiments, cluster tuning):
    # SPARK_GRAFT_CONF='{"spark.sql.adaptive.enabled": "false"}'
    extra = os.environ.get("SPARK_GRAFT_CONF")
    if extra:
        import json

        for k, v in json.loads(extra).items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    ensure_pyfiles(spark)
    return spark
