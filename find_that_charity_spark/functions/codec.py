"""Posting-list codec (SURVEY.md §2B B6): docID-sorted, delta+varint
compressed, block-max metadata every 128 postings.

Layout mirrors Lucene's postings format [public: Lucene PostingsFormat,
BLOCK_SIZE=128] re-expressed for columnar storage: one `postings` binary
blob per (term, segment) row plus a `blockmax` array<struct> column.

Per block of <=128 postings the blob stores three back-to-back varint
streams: doc-id deltas (delta vs previous doc in the SAME block's stream,
first value is delta vs the previous block's last doc, or the raw doc id
for the first block), term frequencies, and doc lengths. Doc lengths are
inlined (Lucene's norms analog) so query-time scoring never joins a
10^12-row doc-length table.

The blockmax entry per block carries:
    last_doc -- last doc id in the block (skip pointer)
    max_tf   -- max term frequency in the block
    min_dl   -- min doc length in the block
    offset   -- byte offset of the block in the blob (direct slicing)
    n        -- postings in the block

The query-time upper bound is idf(t) * tfnorm(max_tf, min_dl, avgdl):
tfnorm is increasing in tf and decreasing in dl, so this dominates every
true posting score in the block for ANY avgdl — which keeps Block-Max
WAND pruning safe even after incremental appends shift corpus stats
(streaming/incremental.py), unlike a bound precomputed with build-time
avgdl.

Everything is numpy-vectorized (no per-posting Python in encode; decode's
only loop is over the <=10 varint byte positions).
"""

from __future__ import annotations

import numpy as np

from find_that_charity_spark.functions.bm25 import B as BM25_B
from find_that_charity_spark.functions.bm25 import K1 as BM25_K1

BLOCK_SIZE = 128  # pinned (BASELINE.json north_star)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array, numpy-vectorized.

    Emits up to 10 bytes per value; continuation bit 0x80 on all but the
    last byte of each value.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp):
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    remaining = v.copy()
    alive = np.ones(v.shape, dtype=bool)
    pos = 0
    while np.any(alive):
        idx = np.flatnonzero(alive)
        byte = (remaining[idx] & np.uint64(0x7F)).astype(np.uint8)
        is_last = pos + 1 == nbytes[idx]
        byte = np.where(is_last, byte, byte | np.uint8(0x80))
        out[starts[idx] + pos] = byte
        remaining[idx] >>= np.uint64(7)
        alive[idx] = ~is_last
        pos += 1
    return out.tobytes()


def varint_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a varint stream to uint64. Vectorized: one pass to find value
    boundaries, then a loop over byte positions (<=10) within values."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (data & 0x80) == 0
    # value index for each byte: number of completed values before it
    value_id = np.concatenate([[0], np.cumsum(is_last)[:-1]])
    n_values = int(is_last.sum())
    starts = np.flatnonzero(np.concatenate([[True], is_last[:-1]]))
    byte_pos = np.arange(data.size, dtype=np.int64) - starts[value_id]
    vals = np.zeros(n_values, dtype=np.uint64)
    payload = (data & np.uint8(0x7F)).astype(np.uint64)
    np.bitwise_or.at(vals, value_id, payload << (np.uint64(7) * byte_pos.astype(np.uint64)))
    if count is not None:
        assert n_values == count, f"varint stream has {n_values} values, expected {count}"
    return vals


def tfnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 tf-normalization (the idf-free factor)."""
    tf = tf.astype(np.float64)
    return tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, list[tuple[int, int, int, int, int]]]:
    """Encode one docID-sorted posting list.

    Returns (blob, blockmax) where blockmax is a list of
    (last_doc, max_tf, min_dl, offset, n) per block of <=128 postings.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return b"", []
    assert np.all(np.diff(doc_ids) > 0), "doc_ids must be strictly increasing"
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)

    parts: list[bytes] = []
    blockmax: list[tuple[int, int, int, int, int]] = []
    offset = 0
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        blk = (
            varint_encode(deltas[s:e])
            + varint_encode(tfs[s:e].astype(np.uint64))
            + varint_encode(dls[s:e].astype(np.uint64))
        )
        parts.append(blk)
        blockmax.append(
            (int(doc_ids[e - 1]), int(tfs[s:e].max()), int(dls[s:e].min()), offset, e - s)
        )
        offset += len(blk)
    return b"".join(parts), blockmax


def decode_block(
    blob: bytes | memoryview, offset: int, n: int, prev_last_doc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block given its blockmax entry. ``prev_last_doc`` is the
    last doc of the previous block (-? use first_doc semantics: pass the
    previous block's last_doc, or 0 for the first block where the first
    delta IS the doc id)."""
    data = np.frombuffer(blob, dtype=np.uint8)[offset:]
    # find end of 3*n varints
    is_last = (data & 0x80) == 0
    ends = np.flatnonzero(is_last)
    total_vals = 3 * n
    data = data[: ends[total_vals - 1] + 1]
    vals = varint_decode(data, count=total_vals)
    deltas = vals[:n].astype(np.int64)
    tfs = vals[n : 2 * n].astype(np.int64)
    dls = vals[2 * n :].astype(np.int64)
    docs = np.cumsum(deltas) + prev_last_doc
    return docs, tfs, dls


def decode_postings(
    blob: bytes | memoryview, blockmax: list[tuple[int, int, int, int, int]]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list (all blocks)."""
    docs_l, tfs_l, dls_l = [], [], []
    prev = 0
    for last_doc, _max_tf, _min_dl, offset, n in blockmax:
        d, t, dl = decode_block(blob, offset, n, prev)
        assert d[-1] == last_doc, "corrupt block: last_doc mismatch"
        docs_l.append(d)
        tfs_l.append(t)
        dls_l.append(dl)
        prev = last_doc
    if not docs_l:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    return np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l)
