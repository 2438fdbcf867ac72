"""PForDelta as an integrated segment-store codec (BuildConfig.block_codec).

BASELINE.json B6 sanctions "delta+varint/PForDelta"; round 3 wires the
standalone pfor codec (functions/pfor.py, tests/test_pfor.py) into the
build/query path behind a self-describing blob header: byte 0 carries the
codec id, so readers and compaction need no config plumbing and stores
may mix codecs (varint base + pfor appends). These tests prove the two
codecs are observationally identical end-to-end — same decoded postings,
same blockmax bounds, same query ranks and scores — and that mixed-codec
merges decode correctly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from find_that_charity_spark.functions.codec import (
    CODEC_PFOR,
    CODEC_VARINT,
    decode_postings,
    encode_postings,
)
from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.sources.synth import write_fixture


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pfor_int")
    fx = str(root / "fx")
    write_fixture(spark, fx, 400)
    idxs = {}
    for name in ("varint", "pfor"):
        idx = str(root / f"idx_{name}")
        build_index(
            spark, f"{fx}/web_pages.parquet", idx,
            BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=200,
                        segment_chunks=2, positions=True, block_codec=name),
        )
        idxs[name] = idx
    return idxs


def _decoded_segments(spark, idx) -> pd.DataFrame:
    """Segment store with postings DECODED (bytes differ across codecs by
    design; the decoded values must not)."""
    pdf = (
        spark.read.parquet(f"{idx}/segments")
        .select("term", "seg_id", "df", "cf", "min_doc", "max_doc",
                "has_positions", "postings", "blockmax")
        .toPandas()
    )

    def dec(row):
        bm = [(b["last_doc"], b["max_tf"], b["min_dl"], b["offset"], b["n"])
              for b in row["blockmax"]]
        out = decode_postings(bytes(row["postings"]), bm, with_positions=True)
        return tuple(tuple(a.tolist()) for a in out)

    pdf["decoded"] = pdf.apply(dec, axis=1)
    pdf["bm_bounds"] = pdf["blockmax"].map(
        lambda bm: tuple((b["last_doc"], b["max_tf"], b["min_dl"], b["n"]) for b in bm)
    )
    return (
        pdf.drop(columns=["postings", "blockmax"])
        .sort_values(["term", "seg_id"])
        .reset_index(drop=True)
    )


def test_decoded_stores_identical(spark, pair):
    a = _decoded_segments(spark, pair["varint"])
    b = _decoded_segments(spark, pair["pfor"])
    pd.testing.assert_frame_equal(a, b)


def test_codec_ids_in_blobs(spark, pair):
    for name, cid in (("varint", CODEC_VARINT), ("pfor", CODEC_PFOR)):
        blobs = (
            spark.read.parquet(f"{pair[name]}/segments")
            .select("postings").limit(20).toPandas()["postings"]
        )
        assert all(bytes(b)[0] == cid for b in blobs)


def test_queries_identical_across_codecs(spark, pair):
    qdf = spark.createDataFrame(
        [("q1", "charitable trust", 10, "freetext"),
         ("q2", "charitable trust", 10, "phrase"),
         ("q3", "w0001 w0042", 10, "bool_and"),
         ("q4", "charitble", 10, "fuzzy")],
        "qid string, text string, k int, mode string",
    )
    ra = run_queries(spark, pair["varint"], qdf).toPandas().sort_values(["qid", "rank"])
    rb = run_queries(spark, pair["pfor"], qdf).toPandas().sort_values(["qid", "rank"])
    assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
    assert ra["score"].tolist() == rb["score"].tolist()


def test_mixed_codec_merge_decodes():
    """_merge_group consumes sub-segments of DIFFERENT codecs (varint base
    + pfor streamed append) because each blob self-describes."""
    from find_that_charity_spark.operators.build import _merge_group

    rng = np.random.default_rng(11)
    rows = []
    for codec, lo in (("varint", 0), ("pfor", 10_000)):
        docs = np.sort(rng.choice(5000, size=300, replace=False)) + lo
        tfs = rng.integers(1, 6, 300)
        dls = rng.integers(10, 200, 300)
        blob, bm = encode_postings(docs, tfs, dls, codec=codec)
        rows.append({
            "term": "t", "bucket": 0, "salt": 0, "seg_id": f"s_{codec}",
            "df": 300, "cf": int(tfs.sum()), "min_doc": int(docs[0]),
            "max_doc": int(docs[-1]), "has_positions": False, "postings": blob,
            "blockmax": [
                {"last_doc": a, "max_tf": b, "min_dl": c, "offset": d, "n": e}
                for a, b, c, d, e in bm
            ],
        })
    merged = _merge_group(codec="pfor")(pd.DataFrame(rows))
    assert len(merged) == 1
    out_bm = [(b["last_doc"], b["max_tf"], b["min_dl"], b["offset"], b["n"])
              for b in merged.iloc[0]["blockmax"]]
    d, t, dl = decode_postings(merged.iloc[0]["postings"], out_bm)
    assert d.size == 600 and np.all(np.diff(d) > 0)
    assert bytes(merged.iloc[0]["postings"])[0] == CODEC_PFOR


def test_mixed_codec_streaming_appends(spark, tmp_path_factory):
    """End-to-end mixed store: varint BASE index + pfor STREAMED appends.
    Queries spanning both segment generations must stay rank-identical to
    the brute-force oracle, and compaction (which may merge a varint
    sub-segment with a pfor one) must preserve results."""
    from find_that_charity_spark.operators.build import compact_segments
    from find_that_charity_spark.operators.oracle import brute_force_topk
    from find_that_charity_spark.operators.query import run_queries
    from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
    from find_that_charity_spark.sources.synth import synth_web_pages
    from find_that_charity_spark.streaming.incremental import incremental_refresh

    root = tmp_path_factory.mktemp("pfor_stream")
    pages = synth_web_pages(300)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, extra = pages.iloc[:200], pages.iloc[200:]
    idx = str(root / "idx")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(str(root / "base"))
    spark.createDataFrame(extra, WEB_PAGES_SCHEMA).write.parquet(str(root / "in"))
    build_index(
        spark, str(root / "base"), idx,
        BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=10_000,
                    segment_chunks=1, block_codec="varint"),
    )
    incremental_refresh(spark, str(root / "in"), idx, num_buckets=8,
                        block_codec="pfor")
    segs = spark.read.parquet(f"{idx}/segments").select("postings").collect()
    codecs = {bytes(r["postings"])[0] for r in segs}
    assert codecs == {CODEC_VARINT, CODEC_PFOR}, codecs  # genuinely mixed

    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "url").toPandas()
    merged = docs.merge(pages[["url", "text"]], on="url", validate="one_to_one")
    merged = merged.sort_values("doc_id")
    qdf = spark.createDataFrame(
        [("q0", "charitable trust", 10, "freetext"), ("q1", "w0001", 10, "freetext")],
        "qid string, text string, k int, mode string",
    )

    def check():
        got = run_queries(spark, idx, qdf).toPandas()
        for qid, text in (("q0", "charitable trust"), ("q1", "w0001")):
            want = brute_force_topk(
                merged["doc_id"].tolist(), merged["text"].tolist(), text, k=10
            )
            mine = got[got["qid"] == qid].sort_values("rank")
            assert mine["doc_id"].tolist() == [d for d, _ in want], text
            for s_got, (_, s_want) in zip(mine["score"], want):
                assert s_got == pytest.approx(s_want, rel=1e-6)

    check()
    compact_segments(spark, idx, max_postings_per_segment=10_000,
                     block_codec="pfor")
    check()
