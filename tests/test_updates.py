"""Document updates/deletes (VERDICT r03 item 1): a re-crawled url with a
newer warc_ts supersedes its old doc — the stale doc leaves query results
immediately (tombstone exclusion) and leaves the store physically at
vacuum, after which BM25 is rank-exact vs the brute oracle again."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.operators.query import read_tombstones, run_queries
from find_that_charity_spark.operators.vacuum import vacuum_index
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
from find_that_charity_spark.sources.synth import synth_web_pages

N_BASE = 200
N_UPDATED = 30
N_NEW = 20


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("upd")
    pages = synth_web_pages(N_BASE + N_NEW)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base = pages.iloc[:N_BASE].copy()
    extra = pages.iloc[N_BASE:].copy()

    idx = str(root / "idx")
    base_path = str(root / "base")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(base_path)
    build_index(
        spark, base_path, idx,
        BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=10_000,
                    segment_chunks=1, positions=True),
    )

    # update batch: first N_UPDATED base urls re-crawled LATER with brand-new
    # text (old terms vanish, marker term 'zzfresh' appears), plus N_NEW
    # genuinely new urls, plus one STALE re-crawl (older ts — must be dropped)
    updated = base.iloc[:N_UPDATED].copy()
    updated["warc_ts"] = updated["warc_ts"] + pd.Timedelta(days=30)
    updated["text"] = [
        f"zzfresh revision w{900 + i % 40:04d} w{800 + i % 25:04d}"
        for i in range(len(updated))
    ]
    updated["html"] = None
    stale = base.iloc[N_UPDATED : N_UPDATED + 5].copy()
    stale["warc_ts"] = stale["warc_ts"] - pd.Timedelta(days=30)
    stale["text"] = "zzbogus never indexed"

    stream_dir = str(root / "incoming")
    batch = pd.concat([updated, extra, stale], ignore_index=True)
    spark.createDataFrame(batch, WEB_PAGES_SCHEMA).write.parquet(stream_dir)

    from find_that_charity_spark.streaming.incremental import incremental_refresh

    incremental_refresh(spark, stream_dir, idx, num_buckets=8)

    # live corpus = base with updated texts swapped in, plus the new urls
    live = pages.copy()
    live = live.set_index("url")
    live.loc[updated["url"].tolist(), "text"] = updated["text"].tolist()
    live = live.reset_index()
    return {
        "idx": idx,
        "live": live,
        "updated_urls": set(updated["url"]),
        "stale_urls": set(stale["url"]),
    }


def _docs(spark, idx):
    return spark.read.parquet(f"{idx}/docs")


def test_tombstones_cover_exactly_updated_urls(spark, setup):
    tomb = read_tombstones(spark, setup["idx"])
    assert tomb.size == N_UPDATED
    docs = _docs(spark, setup["idx"]).toPandas()
    tomb_urls = set(docs[docs["doc_id"].isin(tomb)]["url"])
    assert tomb_urls == setup["updated_urls"]
    # every updated url also has a NEW live row
    live_rows = docs[~docs["doc_id"].isin(tomb)]
    assert set(live_rows["url"]) >= setup["updated_urls"]
    assert live_rows["url"].is_unique


def test_stale_recrawl_dropped(spark, setup):
    """The older-warc_ts re-crawl must not be indexed (no 'zzbogus')."""
    dictionary = spark.read.parquet(f"{setup['idx']}/dictionary")
    assert dictionary.where("term = 'zzbogus'").count() == 0


def test_new_text_returned_stale_excluded(spark, setup):
    """Pre-vacuum: marker query returns exactly the updated docs' NEW rows;
    no tombstoned id appears in any mode's results."""
    tomb = set(read_tombstones(spark, setup["idx"]).tolist())
    qdf = spark.createDataFrame(
        [
            ("q_marker", "zzfresh", 100, "freetext"),
            ("q_and", "zzfresh revision", 100, "bool_and"),
            ("q_phrase", "zzfresh revision", 100, "phrase"),
            ("q_old", "spark merge join window", 50, "freetext"),
        ],
        "qid string, text string, k int, mode string",
    )
    got = run_queries(spark, setup["idx"], qdf, join_urls=True).toPandas()
    assert not set(got["doc_id"]) & tomb, "tombstoned doc in results"
    marker = got[got["qid"] == "q_marker"]
    assert set(marker["url"]) == setup["updated_urls"]
    assert len(marker) == N_UPDATED
    # conjunctive + phrase paths exclude too, and find the updated docs
    assert set(got[got["qid"] == "q_and"]["url"]) == setup["updated_urls"]
    assert set(got[got["qid"] == "q_phrase"]["url"]) == setup["updated_urls"]


def test_vacuum_restores_exact_scores(spark, setup):
    """After vacuum: physical drop + exact df/avgdl -> rank- and score-
    identical to the brute oracle over the live corpus, every mode."""
    res = vacuum_index(spark, setup["idx"])
    assert res["n_tombstones"] == N_UPDATED
    assert read_tombstones(spark, setup["idx"]).size == 0

    docs = _docs(spark, setup["idx"]).toPandas()
    assert docs["url"].is_unique
    assert len(docs) == len(setup["live"])

    corpus = docs.merge(setup["live"][["url", "text"]], on="url", validate="one_to_one")
    qdf = spark.createDataFrame(
        [
            ("q0", "zzfresh revision", 10, "freetext"),
            ("q1", "spark merge join window", 10, "freetext"),
            ("q2", "w0001 -w0002", 10, "freetext"),
        ],
        "qid string, text string, k int, mode string",
    )
    got = run_queries(spark, setup["idx"], qdf).toPandas()
    for qid, q in (("q0", "zzfresh revision"), ("q1", "spark merge join window"),
                   ("q2", "w0001 -w0002")):
        want = brute_force_topk(corpus["doc_id"].tolist(), corpus["text"].tolist(), q, k=10)
        mine = got[got["qid"] == qid].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], q
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6)


def test_vacuum_physically_dropped_postings(spark, setup):
    """No tombstoned doc id survives in any posting list; dictionary df
    equals a fresh recount; stats equal the docs-table aggregate.
    (Runs after test_vacuum_restores_exact_scores in file order.)"""
    from find_that_charity_spark.functions.codec import decode_postings

    idx = setup["idx"]
    docs = _docs(spark, idx).toPandas()
    live_ids = set(docs["doc_id"].tolist())
    segs = spark.read.parquet(f"{idx}/segments").collect()
    seen_df: dict[str, int] = {}
    for r in segs:
        bm = [(b["last_doc"], b["max_tf"], b["min_dl"], b["offset"], b["n"])
              for b in r["blockmax"]]
        d, t, l = decode_postings(r["postings"], bm)  # noqa: E741
        assert set(d.tolist()) <= live_ids, f"stale posting in {r['term']}"
        seen_df[r["term"]] = seen_df.get(r["term"], 0) + len(d)
    dictionary = spark.read.parquet(f"{idx}/dictionary").collect()
    assert {r["term"]: r["df"] for r in dictionary} == seen_df
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()[0]
    assert stats["n_docs"] == len(docs)
    assert stats["total_len"] == int(docs["doc_len"].sum())


def test_replay_after_partial_crash_no_id_collision(spark, tmp_path):
    """Crash window: docs appended but the done mark lost. The replay must
    not duplicate rows NOR hand out colliding doc ids to the next batch
    (the id reservation written before any append guarantees both)."""
    from find_that_charity_spark.streaming.incremental import _append_batch

    pages = synth_web_pages(80)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, b1, b2 = pages.iloc[:40], pages.iloc[40:60].copy(), pages.iloc[60:].copy()
    idx = str(tmp_path / "idx")
    bp = str(tmp_path / "base")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(bp)
    build_index(spark, bp, idx, BuildConfig(num_buckets=4, id_buckets=4,
                                            segment_chunks=1))

    b1_df = spark.createDataFrame(b1, WEB_PAGES_SCHEMA)
    _append_batch(spark, b1_df, 0, idx, num_buckets=4, stream_id="s")

    # simulate the crash: drop ONLY the done mark, keep the reservation
    mpath = f"{idx}/manifest.jsonl"
    entries = [json.loads(ln) for ln in open(mpath)]
    kept = [e for e in entries
            if not (e.get("stage") == "stream_batch" and e.get("unit") == "s:0")]
    assert len(kept) == len(entries) - 1
    with open(mpath, "w") as f:
        for e in kept:
            f.write(json.dumps(e) + "\n")

    # replay of the same epoch: must land on the empty path, re-mark with
    # the reserved counts, and leave the docs table untouched
    n_before = _docs(spark, idx).count()
    _append_batch(spark, b1_df, 0, idx, num_buckets=4, stream_id="s")
    docs = _docs(spark, idx).toPandas()
    assert len(docs) == n_before
    assert docs["doc_id"].is_unique and docs["url"].is_unique

    # next epoch: ids must continue above the replayed batch's range
    _append_batch(spark, spark.createDataFrame(b2, WEB_PAGES_SCHEMA), 1, idx,
                  num_buckets=4, stream_id="s")
    docs = _docs(spark, idx).toPandas()
    assert docs["doc_id"].is_unique and docs["url"].is_unique
    assert len(docs) == 80

    from find_that_charity_spark.streaming.incremental import refresh_stats

    refresh_stats(spark, idx)
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()[0]
    assert stats["n_docs"] == 80
    assert stats["total_len"] == int(docs["doc_len"].sum())


def test_update_streaming_replay_idempotent(spark, tmp_path):
    """An UPDATE batch replayed after a lost done mark: tombstones are
    recomputed (not lost), no duplicate rows, stats stay exact."""
    from find_that_charity_spark.streaming.incremental import (
        _append_batch,
        refresh_stats,
    )

    pages = synth_web_pages(60)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base = pages.iloc[:50]
    idx = str(tmp_path / "idx")
    bp = str(tmp_path / "base")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(bp)
    build_index(spark, bp, idx, BuildConfig(num_buckets=4, id_buckets=4,
                                            segment_chunks=1))

    upd = base.iloc[:10].copy()
    upd["warc_ts"] = upd["warc_ts"] + pd.Timedelta(days=10)
    upd["text"] = "zzfresh replay text"
    upd["html"] = None
    upd_df = spark.createDataFrame(upd, WEB_PAGES_SCHEMA)
    _append_batch(spark, upd_df, 0, idx, num_buckets=4, stream_id="s")
    tomb1 = read_tombstones(spark, idx)
    assert tomb1.size == 10

    mpath = f"{idx}/manifest.jsonl"
    entries = [json.loads(ln) for ln in open(mpath)]
    kept = [e for e in entries
            if not (e.get("stage") == "stream_batch" and e.get("unit") == "s:0")]
    with open(mpath, "w") as f:
        for e in kept:
            f.write(json.dumps(e) + "\n")

    _append_batch(spark, upd_df, 0, idx, num_buckets=4, stream_id="s")
    tomb2 = read_tombstones(spark, idx)
    assert np.array_equal(tomb1, tomb2)
    docs = _docs(spark, idx).toPandas()
    assert len(docs) == 60  # 50 base + 10 re-indexed; old rows tombstoned
    assert docs["doc_id"].is_unique

    refresh_stats(spark, idx)
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()[0]
    assert stats["n_docs"] == 50  # live corpus unchanged in SIZE by updates


def test_replay_after_PARTIAL_docs_append(spark, tmp_path):
    """ADVICE r04 (medium): parquet multi-file job commit is not atomic on
    a real FS — a crashed append can be PARTIALLY visible. The replay must
    re-issue the crashed attempt's EXACT ids (not recompute "fresh" from
    the half-landed table, which would collide) and append only the
    missing rows. Simulated by deleting a strict subset of the appended
    files after dropping the done mark."""
    import os

    from find_that_charity_spark.streaming.incremental import (
        _append_batch,
        refresh_stats,
    )

    pages = synth_web_pages(80)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, b1 = pages.iloc[:40], pages.iloc[40:].copy()
    idx = str(tmp_path / "idx")
    bp = str(tmp_path / "base")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(bp)
    build_index(spark, bp, idx, BuildConfig(num_buckets=4, id_buckets=4,
                                            segment_chunks=1))
    base_max = _docs(spark, idx).agg({"doc_id": "max"}).collect()[0][0]

    b1_df = spark.createDataFrame(b1, WEB_PAGES_SCHEMA)
    _append_batch(spark, b1_df, 0, idx, num_buckets=4, stream_id="s")
    full = _docs(spark, idx).toPandas().sort_values("doc_id").reset_index(drop=True)
    appended = full[full["doc_id"] > base_max]
    assert len(appended) == 40

    # crash simulation: drop the done mark AND un-land a subset of the
    # appended rows by deleting some of the files the append job wrote
    mpath = f"{idx}/manifest.jsonl"
    entries = [json.loads(ln) for ln in open(mpath)]
    kept = [e for e in entries
            if not (e.get("stage") == "stream_batch" and e.get("unit") == "s:0")]
    assert len(kept) == len(entries) - 1
    with open(mpath, "w") as f:
        for e in kept:
            f.write(json.dumps(e) + "\n")
    from pyspark.sql import functions as F

    new_files = sorted(
        r[0]
        for r in _docs(spark, idx)
        .where(F.col("doc_id") > base_max)
        .select(F.input_file_name())
        .distinct()
        .collect()
    )
    assert len(new_files) >= 2, "need >=2 appended files to simulate partial"
    victims = new_files[: len(new_files) // 2]
    for uri in victims:
        os.remove(uri.removeprefix("file://").removeprefix("file:"))
    spark.catalog.clearCache()
    partial = _docs(spark, idx).toPandas()
    n_landed = (partial["doc_id"] > base_max).sum()
    assert 0 < n_landed < 40

    # replay: must complete the append under the ORIGINAL ids
    _append_batch(spark, b1_df, 0, idx, num_buckets=4, stream_id="s")
    docs = _docs(spark, idx).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert docs["doc_id"].is_unique and docs["url"].is_unique
    pd.testing.assert_frame_equal(docs, full)

    # next epoch continues above; stats exact
    refresh_stats(spark, idx)
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()[0]
    assert stats["n_docs"] == 80
    assert stats["total_len"] == int(docs["doc_len"].sum())


def test_recover_docs_swap_windows(tmp_path):
    """ADVICE r04 (low): every crash window of the non-bucketed docs swap
    (docs -> docs_old, docs_new -> docs, rm docs_old) must be repaired at
    vacuum start, mirroring _recover_segment_swap."""
    import os

    from find_that_charity_spark.operators.vacuum import _recover_docs_swap

    def mk(*dirs):
        root = tmp_path / f"case_{mk.n}"
        mk.n += 1
        for d in dirs:
            os.makedirs(root / d)
            (root / d / "part-0.parquet").write_bytes(b"x")
        return str(root)

    mk.n = 0
    # between the two renames: docs gone, old+new present -> finish swap
    r = mk("docs_old", "docs_new")
    _recover_docs_swap(r)
    assert os.path.exists(f"{r}/docs") and not os.path.exists(f"{r}/docs_old")
    assert not os.path.exists(f"{r}/docs_new")
    # after second rename, before cleanup: docs + old -> drop old
    r = mk("docs", "docs_old")
    _recover_docs_swap(r)
    assert os.path.exists(f"{r}/docs") and not os.path.exists(f"{r}/docs_old")
    # before any rename: docs + stale docs_new -> untouched (rerun overwrites)
    r = mk("docs", "docs_new")
    _recover_docs_swap(r)
    assert os.path.exists(f"{r}/docs") and os.path.exists(f"{r}/docs_new")
    # defensive: only docs_old survives -> restore it
    r = mk("docs_old")
    _recover_docs_swap(r)
    assert os.path.exists(f"{r}/docs") and not os.path.exists(f"{r}/docs_old")
    # healthy store -> no-op
    r = mk("docs")
    _recover_docs_swap(r)
    assert os.path.exists(f"{r}/docs")
