"""Corpus reader abstraction (SURVEY.md §2C C1).

Production input is an Iceberg table of Common-Crawl-style web pages
(BASELINE.json input_hint):

    web_pages(url string, warc_ts timestamp, html binary,
              text string, lang string)

In the sandbox there is no Iceberg runtime jar and no network, so the same
schema is read from Parquet. One function hides the difference; everything
downstream sees a DataFrame of the pinned schema. Catalyst prunes ``html``
(usually the biggest column) whenever the plan doesn't reference it, and
pushes ``lang``/``warc_ts`` predicates into Iceberg manifests / Parquet
row-group stats — keep filters native and *before* any UDF so this works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("warc_ts", TimestampType(), nullable=False),
        StructField("html", BinaryType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("lang", StringType(), nullable=True),
    ]
)


def read_corpus(
    spark: SparkSession,
    source: str,
    langs: list[str] | None = None,
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """Read the web_pages corpus from an Iceberg table or a Parquet path.

    ``source`` containing ``/`` (a filesystem path) → Parquet; otherwise a
    catalog table name → ``spark.read.table`` (Iceberg in prod). Optional
    lang / warc_ts pushdown filters are applied natively so they reach the
    scan (partition pruning on Iceberg, row-group stats on Parquet).
    """
    if "/" in source:
        df = spark.read.schema(WEB_PAGES_SCHEMA).parquet(source)
    else:
        df = spark.read.table(source)
    if langs:
        df = df.where(F.col("lang").isin(langs))
    if ts_min:
        df = df.where(F.col("warc_ts") >= F.lit(ts_min).cast("timestamp"))
    if ts_max:
        df = df.where(F.col("warc_ts") < F.lit(ts_max).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (TESTDATA.md) by name.

    Reader plans are mtime-cached (optimization round 6 batch 2): a fresh
    ``spark.read.parquet`` pays a ~20-30 ms listing/schema job per call,
    and the gates re-open the same fixture tables constantly. The cache
    invalidates whenever the file changes (same discipline as the
    dictionary/stats caches in operators/query.py)."""
    from find_that_charity_spark.operators.query import cached_parquet

    return cached_parquet(spark, f"{sf_dir}/{name}.parquet")


def widen_scan(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition a scan whose natural parallelism is below
    the session's core count (optimization round 6, guide §2.5 "input
    skew: one huge unsplittable file ... repartition immediately after
    the read").

    Parquet scans parallelize at row-group granularity, so a
    single-row-group file is ONE task no matter what
    ``maxPartitionBytes`` says — the driver's fixture tables are exactly
    that shape, and every tokenize/hash/decode pass over them was running
    single-threaded on a 32-core session. The check is plan-time only
    (``rdd.getNumPartitions`` launches no job); a well-laid-out input
    (≥ cores row groups / files, the 100-TB case) is returned unchanged,
    so this never adds a shuffle where the scan already spreads.

    Apply ONLY where real per-row compute follows the scan: the shuffle
    moves the raw rows once (guide §2.3), which only pays for itself when
    the downstream work per row dwarfs a row's shuffle cost."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
