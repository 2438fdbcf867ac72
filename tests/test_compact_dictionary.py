"""C10/C11 round-5 reorder: the dictionary is computed BEFORE compaction
and drives the merge decision (mergeable = n_segments > 1 AND df <= cap),
so the no-merge case costs one dictionary-sized job instead of a groupBy
over the whole segment store. When a merge DOES happen (the head sampler
over-salted a tail term), the dictionary is recomputed with an atomic
swap and the hardlink base snapshot is retaken — these tests pin that
whole path plus its crash recovery."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from find_that_charity_spark.operators.build import (
    BuildConfig,
    _recover_dictionary_swap,
    build_index,
)
from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.sources.synth import write_fixture

N_DOCS = 400
# cap=60 + a 2000-token head sample over-salts ~13 tail terms at this
# corpus size (sampling overestimates their df past the cap) — the
# genuine-merge path runs on every build of this fixture
CFG = BuildConfig(
    num_buckets=4, id_buckets=4, max_postings_per_segment=60,
    head_sample_tokens=2000, positions=True,
)


@pytest.fixture(scope="module")
def merged_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdx")
    fx = str(root / "fx")
    idx = str(root / "idx")
    write_fixture(spark, fx, N_DOCS)
    build_index(spark, f"{fx}/web_pages.parquet", idx, CFG)
    return {"fixture": fx, "index": idx}


def _manifest(idx: str) -> list[dict]:
    with open(f"{idx}/manifest.jsonl") as f:
        return [json.loads(line) for line in f if line.strip()]


def test_merge_happened_and_store_is_consistent(spark, merged_index):
    idx = merged_index["index"]
    comp = [e for e in _manifest(idx) if e["stage"] == "compact"][0]
    assert comp["n_terms_merged"] > 0, "fixture premise: over-salting merges"

    # dictionary n_segments must equal the store's actual per-term counts
    store = (
        spark.read.parquet(f"{idx}/segments")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("df").alias("df"))
    )
    d = spark.read.parquet(f"{idx}/dictionary").select(
        "term", "n_segments", F.col("df").alias("ddf")
    )
    diverged = (
        store.join(d, "term")
        .where((F.col("n") != F.col("n_segments")) | (F.col("df") != F.col("ddf")))
        .count()
    )
    assert diverged == 0

    # post-merge the mergeable set is empty (compaction is idempotent):
    # every remaining multi-segment term exceeds the cap
    residual = d.where(
        (F.col("n_segments") > 1) & (F.col("ddf") <= CFG.max_postings_per_segment)
    ).count()
    assert residual == 0


def test_base_snapshot_reflects_refreshed_dictionary(spark, merged_index):
    idx = merged_index["index"]
    live = sorted(
        map(tuple, spark.read.parquet(f"{idx}/dictionary").collect())
    )
    base = sorted(
        map(tuple, spark.read.parquet(f"{idx}/dictionary_base").collect())
    )
    assert live == base


def test_queries_exact_over_merged_store(spark, merged_index):
    from find_that_charity_spark.operators.query import run_queries

    idx = merged_index["index"]
    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "url").toPandas()
    pages = spark.read.parquet(
        f"{merged_index['fixture']}/web_pages.parquet"
    ).toPandas()
    latest = pages.sort_values("warc_ts").groupby("url").tail(1)
    corpus = docs.merge(latest[["url", "text"]], on="url").sort_values("doc_id")

    qdf = spark.createDataFrame(
        [("q", "w0005 w0011 w0019 w0030", 10, "freetext")],
        "qid string, text string, k int, mode string",
    )
    got = [
        (int(r["doc_id"]), round(float(r["score"]), 6))
        for r in run_queries(spark, idx, qdf).orderBy("rank").collect()
    ]
    want = [
        (d, round(s, 6))
        for d, s in brute_force_topk(
            corpus["doc_id"], corpus["text"], "w0005 w0011 w0019 w0030", k=10
        )
    ]
    assert got == want


def test_dictionary_swap_recovery(spark, merged_index, tmp_path):
    """Simulate every crash point of the _refresh_dictionary swap and
    assert recovery restores a readable, current dictionary."""
    import shutil

    idx = merged_index["index"]
    d = f"{idx}/dictionary"
    rows = sorted(map(tuple, spark.read.parquet(d).collect()))

    # crash after writing dictionary_new, before any rename
    shutil.copytree(d, f"{d}_new")
    _recover_dictionary_swap(idx)
    assert not any(
        __import__("os").path.exists(p) for p in (f"{d}_new", f"{d}_old")
    )
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == rows

    # crash between the two renames: old aside, new not yet in
    shutil.copytree(d, f"{d}_new")
    shutil.move(d, f"{d}_old")
    _recover_dictionary_swap(idx)
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == rows

    # crash after new in, old not yet dropped
    shutil.copytree(d, f"{d}_old")
    _recover_dictionary_swap(idx)
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == rows
