"""Warm single-query path (VERDICT r02 item 7): a preloaded IndexSearcher
answers a warm query in ONE Spark job — per-query constants ride as
literal map expressions (no broadcast-join job) and the single-qid group
is a narrow coalesce(1) + mapInPandas (no groupBy exchange jobs).
Results must stay identical to the batched run_queries path."""

from __future__ import annotations

import numpy as np
import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.query import IndexSearcher, run_queries
from find_that_charity_spark.sources.synth import write_fixture


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warm")
    fx, idx = str(root / "fx"), str(root / "idx")
    write_fixture(spark, fx, 400)
    build_index(
        spark, f"{fx}/web_pages.parquet", idx,
        BuildConfig(num_buckets=8, id_buckets=8, segment_chunks=1, positions=True),
    )
    return idx


def test_warm_search_is_one_spark_job(spark, index):
    s = IndexSearcher(spark, index)
    assert s._term_map is not None, "toy dictionary must preload"
    s.search("charitable trust", k=10)  # warm the JVM/codegen paths
    sc = spark.sparkContext
    for i, (q, mode) in enumerate(
        [
            ("charitable trust", "freetext"),
            ("acme w0001", "freetext"),
            ("w0001", "freetext"),
            # VERDICT r03 item 6: warm fuzzy must also be ONE job — the
            # edit-1 expansion probes the pinned term map driver-side
            ("charitible", "fuzzy"),
            ("charitable trust", "phrase"),
            ("charitable trust", "bool_and"),
        ]
    ):
        group = f"warmjob_{i}"
        sc.setJobGroup(group, "warm query job count")
        got = s.search(q, k=10, mode=mode)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        assert n_jobs == 1, f"{q} ({mode}): {n_jobs} jobs (expected 1 warm)"
        assert got, q
    s.close()


def test_warm_search_matches_run_queries(spark, index):
    s = IndexSearcher(spark, index)
    cases = [
        ("charitable trust", "freetext"),
        ("acme w0001", "freetext"),
        ("charitable trust", "phrase"),
        ("charitible", "fuzzy"),
        ("charitable trust", "bool_and"),
    ]
    qdf = spark.createDataFrame(
        [(f"q{i}", q, 10, m) for i, (q, m) in enumerate(cases)],
        "qid string, text string, k int, mode string",
    )
    want = run_queries(spark, index, qdf).toPandas()
    for i, (q, m) in enumerate(cases):
        mine = s.search(q, k=10, mode=m)
        w = want[want["qid"] == f"q{i}"].sort_values("rank")
        assert [d for _, d, _ in mine] == w["doc_id"].tolist(), (q, m)
        np.testing.assert_allclose(
            [x for _, _, x in mine], w["score"].to_numpy(), rtol=1e-12
        )
    s.close()
