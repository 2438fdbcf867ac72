"""Measured anchor for the tiered-compaction cost model (docs/SCALE.md):
same store, fold (compact_stream_chunks) vs major (compact_segments).

Builds a base index, streams a small re-crawl in two refresh rounds, then
duplicates the store and runs the minor fold on one copy and the major
compaction on the other — reporting wall clock and BYTES PHYSICALLY
REWRITTEN (new inodes) for each. The fold's bytes should track the
streamed fraction; the major's the whole store.

Run:  TMPDIR=/dev/shm python scripts/bench_fold.py [n_base] [n_stream]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def du_inodes(path: str) -> tuple[int, set[int]]:
    """(total bytes, inode set) under path."""
    total, inos = 0, set()
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            st = os.stat(os.path.join(dirpath, fn))
            total += st.st_size
            inos.add(st.st_ino)
    return total, inos


def main(n_base: int = 200_000, n_stream: int = 10_000) -> None:
    from pyspark.sql import SparkSession

    from find_that_charity_spark.operators.build import (
        BuildConfig,
        build_index,
        compact_segments,
        compact_stream_chunks,
    )
    from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
    from find_that_charity_spark.sources.synth import synth_web_pages
    from find_that_charity_spark.streaming.incremental import (
        incremental_refresh,
        refresh_stats,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ftc_fold_")
    idx = os.path.join(work, "idx")
    all_pages = (
        synth_web_pages(n_base + n_stream, seed=42)
        .sort_values("warc_ts").groupby("url").tail(1).sort_index()
    )
    base, stream = all_pages.iloc[:n_base], all_pages.iloc[n_base:]
    src = os.path.join(work, "base")
    spark.createDataFrame(base, schema=WEB_PAGES_SCHEMA).write.parquet(src)
    t0 = time.time()
    build_index(spark, src, idx, BuildConfig(num_buckets=8, id_buckets=32))
    print(f"base build {len(base)} docs: {time.time()-t0:.1f}s")

    stream_dir = os.path.join(work, "incoming")
    halves = (stream.iloc[: len(stream) // 2], stream.iloc[len(stream) // 2:])
    for half, mode in zip(halves, ("overwrite", "append")):
        spark.createDataFrame(half, schema=WEB_PAGES_SCHEMA).coalesce(2).write.mode(
            mode
        ).parquet(stream_dir)
        incremental_refresh(spark, stream_dir, idx, num_buckets=8)
    seg = f"{idx}/segments"
    minor = [d for d in os.listdir(seg) if d.startswith("chunk=stream_")]
    total0, inos0 = du_inodes(seg)
    print(f"store: {total0/1e6:.1f} MB, {len(minor)} stream chunks")

    idx_major = os.path.join(work, "idx_major")
    shutil.copytree(idx, idx_major)

    # JIT/codegen warmup on scratch copies so neither timed run pays the
    # one-off kernel-compile cost of whichever goes first
    for warm_src, op in ((idx, compact_stream_chunks), (idx_major, compact_segments)):
        scratch = os.path.join(work, "scratch")
        shutil.copytree(warm_src, scratch)
        op(spark, scratch, max_postings_per_segment=1_000_000)
        shutil.rmtree(scratch)

    t0 = time.time()
    n = compact_stream_chunks(spark, idx, max_postings_per_segment=1_000_000)
    fold_wall = time.time() - t0
    total1, inos1 = du_inodes(f"{idx}/segments")
    fold_new = sum(
        os.stat(os.path.join(dp, f)).st_size
        for dp, _d, fs in os.walk(f"{idx}/segments")
        for f in fs
        if os.stat(os.path.join(dp, f)).st_ino not in inos0
    )
    print(f"FOLD: {fold_wall:.1f}s, chunks folded={n}, "
          f"bytes rewritten={fold_new/1e6:.1f} MB "
          f"({100*fold_new/max(total1,1):.1f}% of store)")

    _, inos_m0 = du_inodes(f"{idx_major}/segments")
    t0 = time.time()
    nm = compact_segments(spark, idx_major, max_postings_per_segment=1_000_000)
    major_wall = time.time() - t0
    total2, _ = du_inodes(f"{idx_major}/segments")
    major_new = sum(
        os.stat(os.path.join(dp, f)).st_size
        for dp, _d, fs in os.walk(f"{idx_major}/segments")
        for f in fs
        if os.stat(os.path.join(dp, f)).st_ino not in inos_m0
    )
    print(f"MAJOR: {major_wall:.1f}s, terms merged={nm}, "
          f"bytes rewritten={major_new/1e6:.1f} MB "
          f"({100*major_new/max(total2,1):.1f}% of store)")
    print(f"fold/major wall: {fold_wall/major_wall:.2f}x, "
          f"bytes: {fold_new/max(major_new,1):.2f}x")
    refresh_stats(spark, idx)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10_000,
    )
