"""Driver-side mtime-keyed caches (VERDICT r04 item 5): corpus_stats and
tombstones re-reads cost one constant Spark job per batch; a warm driver
must serve repeats at zero jobs WITHOUT ever serving stale values — any
on-disk rewrite (refresh_stats, vacuum, a new tombstone unit) changes the
mtime signature and invalidates."""

from __future__ import annotations

import os
import time

import numpy as np

from find_that_charity_spark.operators.query import (
    _STATS_CACHE,
    _TOMB_CACHE,
    load_stats,
    read_tombstones,
)
from find_that_charity_spark.plans.checkpoint import write_format


def _write_stats(spark, idx, n_docs, avgdl):
    spark.createDataFrame(
        [(n_docs, n_docs * 10, float(avgdl))],
        "n_docs long, total_len long, avgdl double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{idx}/corpus_stats")


def test_stats_cache_serves_and_invalidates(spark, tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    write_format(idx)
    _write_stats(spark, idx, 100, 12.0)
    assert load_stats(spark, idx) == (100, 12.0)
    assert idx in _STATS_CACHE
    # cached: poke the cache to prove the hit path is taken
    _STATS_CACHE[idx] = (_STATS_CACHE[idx][0], 100, 99.0)
    assert load_stats(spark, idx) == (100, 99.0)
    # rewrite on disk -> signature changes -> fresh read wins
    time.sleep(0.01)  # distinct mtime_ns even on coarse filesystems
    _write_stats(spark, idx, 200, 34.0)
    assert load_stats(spark, idx) == (200, 34.0)


def test_tombstone_cache_serves_and_invalidates(spark, tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    tomb = f"{idx}/tombstones"
    assert read_tombstones(spark, idx).size == 0  # absent dir: no cache
    spark.createDataFrame([(3,), (1,)], "doc_id long").coalesce(1).write.parquet(
        f"{tomb}/unit=a"
    )
    assert read_tombstones(spark, idx).tolist() == [1, 3]
    assert idx in _TOMB_CACHE
    _TOMB_CACHE[idx] = (_TOMB_CACHE[idx][0], np.array([7], dtype=np.int64))
    assert read_tombstones(spark, idx).tolist() == [7]  # cache hit proven
    # a NEW unit appears (streaming append) -> invalidated
    time.sleep(0.01)
    spark.createDataFrame([(9,)], "doc_id long").coalesce(1).write.parquet(
        f"{tomb}/unit=b"
    )
    assert read_tombstones(spark, idx).tolist() == [1, 3, 9]
    # an EXISTING unit rewritten in place (replay) -> also invalidated
    time.sleep(0.01)
    spark.createDataFrame([(9,), (5,)], "doc_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tomb}/unit=b")
    assert read_tombstones(spark, idx).tolist() == [1, 3, 5, 9]
    # vacuum removes the dir -> empty again, not stale
    import shutil

    shutil.rmtree(tomb)
    assert read_tombstones(spark, idx).size == 0
