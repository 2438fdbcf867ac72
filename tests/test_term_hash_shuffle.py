"""term_hash_shuffle (VERDICT r02 item 9): shuffling (t64, doc_id, dl)
through the inversion exchange must produce a segment store equivalent
to the string path — identical postings per term, identical dictionary,
identical query results."""

from __future__ import annotations

import pandas as pd
import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.sources.synth import write_fixture


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("thash")
    fx = str(root / "fx")
    write_fixture(spark, fx, 400)
    idxs = {}
    for name, flag in (("str", False), ("t64", True)):
        idx = str(root / f"idx_{name}")
        build_index(
            spark, f"{fx}/web_pages.parquet", idx,
            BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=200,
                        segment_chunks=2, positions=True, term_hash_shuffle=flag),
        )
        idxs[name] = idx
    return idxs


def _segments(spark, idx) -> pd.DataFrame:
    pdf = (
        spark.read.parquet(f"{idx}/segments")
        .select("term", "bucket", "salt", "seg_id", "df", "cf", "min_doc",
                "max_doc", "has_positions", "postings", "blockmax")
        .toPandas()
    )
    pdf["postings"] = pdf["postings"].map(bytes)
    pdf["blockmax"] = pdf["blockmax"].map(
        lambda bm: tuple(tuple(b) for b in bm)
    )
    return pdf.sort_values(["term", "seg_id"]).reset_index(drop=True)


def test_segment_store_equivalent(spark, pair):
    a, b = _segments(spark, pair["str"]), _segments(spark, pair["t64"])
    pd.testing.assert_frame_equal(a, b)


def test_dictionary_and_queries_identical(spark, pair):
    da = spark.read.parquet(f"{pair['str']}/dictionary").toPandas().sort_values(
        ["term", "bucket"]).reset_index(drop=True)
    db = spark.read.parquet(f"{pair['t64']}/dictionary").toPandas().sort_values(
        ["term", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(da, db)
    qdf = spark.createDataFrame(
        [("q1", "charitable trust", 10, "freetext"),
         ("q2", "charitable trust", 10, "phrase"),
         ("q3", "w0001 w0042", 10, "bool_and")],
        "qid string, text string, k int, mode string",
    )
    ra = run_queries(spark, pair["str"], qdf).toPandas().sort_values(["qid", "rank"])
    rb = run_queries(spark, pair["t64"], qdf).toPandas().sort_values(["qid", "rank"])
    assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
    assert ra["score"].tolist() == rb["score"].tolist()
