"""Resumability (C13, SURVEY.md §5.5): interrupt after a partial segment
write, rerun, verify only pending units recompute and the final index is
identical to an uninterrupted build. Plus doc_id partition-independence."""

from __future__ import annotations

import hashlib
import json
import shutil

import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.doc_ids import assign_doc_ids
from find_that_charity_spark.plans.checkpoint import Manifest
from find_that_charity_spark.sources.synth import write_fixture

CFG = BuildConfig(num_buckets=8, id_buckets=16, max_postings_per_segment=300, segment_chunks=2)


def _segment_digest(spark, index_dir: str) -> list[tuple]:
    rows = (
        spark.read.parquet(f"{index_dir}/segments")
        .select("term", "salt", "df", "cf", "min_doc", "max_doc", "postings")
        .collect()
    )
    return sorted(
        (r["term"], r["salt"], r["df"], r["cf"], r["min_doc"], r["max_doc"],
         hashlib.md5(bytes(r["postings"])).hexdigest())
        for r in rows
    )


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("resume") / "fx")
    write_fixture(spark, fx, 300)
    return fx


def test_resume_recomputes_only_pending(spark, fixture_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_idx")
    idx_full = str(root / "full")
    idx_int = str(root / "interrupted")
    src = f"{fixture_dir}/web_pages.parquet"

    build_index(spark, src, idx_full, CFG)

    # build, then simulate an interruption after segment chunk 0:
    build_index(spark, src, idx_int, CFG)
    mf = Manifest(idx_int)
    keep = [
        e
        for e in mf.entries()
        if not (
            (e["stage"] == "segments" and e["unit"] == "1")
            or e["stage"] in ("compact", "dictionary")
        )
    ]
    with open(mf.path, "w") as f:
        for e in keep:
            f.write(json.dumps(e) + "\n")
    shutil.rmtree(f"{idx_int}/segments/chunk=1")
    shutil.rmtree(f"{idx_int}/dictionary")

    build_index(spark, src, idx_int, CFG)

    mf2 = Manifest(idx_int)
    seg_entries = [e for e in mf2.entries() if e["stage"] == "segments"]
    # chunk 0 was NOT recomputed: exactly one manifest entry survives for it
    assert sorted(e["unit"] for e in seg_entries) == ["0", "1"]
    assert _segment_digest(spark, idx_int) == _segment_digest(spark, idx_full)

    docs_full = sorted(
        (r["url"], r["doc_id"])
        for r in spark.read.parquet(f"{idx_full}/docs").collect()
    )
    docs_int = sorted(
        (r["url"], r["doc_id"])
        for r in spark.read.parquet(f"{idx_int}/docs").collect()
    )
    assert docs_full == docs_int


def test_rebuild_is_noop(spark, fixture_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("noop") / "idx")
    src = f"{fixture_dir}/web_pages.parquet"
    build_index(spark, src, idx, CFG)
    before = Manifest(idx).entries()
    build_index(spark, src, idx, CFG)  # everything done -> no new entries
    after = Manifest(idx).entries()
    assert [(e["stage"], e["unit"], e["ts"]) for e in before] == [
        (e["stage"], e["unit"], e["ts"]) for e in after
    ]


def test_fused_dedup_assign_equivalent(spark, fixture_dir):
    """dedup_and_assign_ids == assign_doc_ids(dedup_latest_by_url(...)):
    same kept rows, same url -> doc_id mapping (incl. duplicate urls)."""
    from find_that_charity_spark.operators.dedup import dedup_latest_by_url
    from find_that_charity_spark.operators.doc_ids import dedup_and_assign_ids

    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet").select(
        "url", "warc_ts", "lang", "text"
    )
    fused = dedup_and_assign_ids(pages, num_buckets=16)
    twostep = assign_doc_ids(dedup_latest_by_url(pages), num_buckets=16)
    a = sorted((r["url"], r["doc_id"], r["text"]) for r in fused.collect())
    b = sorted((r["url"], r["doc_id"], r["text"]) for r in twostep.collect())
    assert a == b
    # fused path is partition-layout-independent too
    c = dedup_and_assign_ids(pages.repartition(13), num_buckets=16)
    assert sorted((r["url"], r["doc_id"]) for r in c.collect()) == [
        (u, d) for u, d, _ in a
    ]


def test_doc_ids_independent_of_partitioning(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet").select("url").distinct()
    a = assign_doc_ids(pages.repartition(1), num_buckets=16)
    b = assign_doc_ids(pages.repartition(13), num_buckets=16)
    ma = sorted((r["url"], r["doc_id"]) for r in a.collect())
    mb = sorted((r["url"], r["doc_id"]) for r in b.collect())
    assert ma == mb
    ids = sorted(i for _, i in ma)
    assert ids == list(range(len(ids)))
