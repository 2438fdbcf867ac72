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

# On-disk index format version, stamped into <index_dir>/format.json at
# build time and checked at read time (plans/checkpoint.py). Version 2
# introduced the self-describing codec-id byte at blob offset 0; a v1 blob
# (r02-era, no codec byte) starts directly with varint data, so byte 0 is
# often 0x01 — which would misroute decode_block to the PFOR path and
# score garbage. Readers fail fast with a rebuild hint instead.
FORMAT_VERSION = 2

# blob byte 0 is the block-stream codec id — the blob is self-describing,
# so readers never need config plumbing and a segment store may mix
# codecs (e.g. a varint base index + pfor streamed appends) safely:
#   0x00  delta+varint streams (default)
#   0x01  PForDelta (NewPFD) streams — functions/pfor.py
CODEC_VARINT = 0
CODEC_PFOR = 1
_CODEC_IDS = {"varint": CODEC_VARINT, "pfor": CODEC_PFOR}


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


def _position_deltas(positions_flat: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Within-posting delta encoding of a flat positions array.

    ``positions_flat`` concatenates each posting's ascending position list;
    posting i owns ``tfs[i]`` entries. The first position of each posting
    is stored raw, later ones as gaps — all vectorized."""
    if positions_flat.size == 0:
        return positions_flat.astype(np.uint64)
    deltas = np.empty_like(positions_flat)
    deltas[0] = positions_flat[0]
    deltas[1:] = positions_flat[1:] - positions_flat[:-1]
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    deltas[starts] = positions_flat[starts]  # reset at posting boundaries
    return deltas.astype(np.uint64)


def _positions_from_deltas(deltas: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_position_deltas` (vectorized segmented cumsum)."""
    if deltas.size == 0:
        return deltas.astype(np.int64)
    vals = deltas.astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    # segmented cumsum: global cumsum minus the cumsum value just before
    # each segment start, broadcast over the segment
    g = np.cumsum(vals)
    seg_base = np.repeat(g[starts] - vals[starts], tfs.astype(np.int64))
    return g - seg_base


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions_flat: np.ndarray | None = None,
    codec: str = "varint",
) -> tuple[bytes, list[tuple[int, int, int, int, int]]]:
    """Encode one docID-sorted posting list.

    Returns (blob, blockmax) where blockmax is a list of
    (last_doc, max_tf, min_dl, offset, n) per block of <=128 postings.
    Blob byte 0 is the codec id (see CODEC_*); block offsets start at 1.

    ``positions_flat`` (optional, Lucene positions analog): ascending
    token positions per posting, concatenated; posting i owns tfs[i]
    entries. When present, each block carries a 4th varint stream of
    within-posting position gaps — phrase queries decode it, everything
    else skips it for free (streams are length-delimited by tf sums).

    ``codec='pfor'`` swaps every per-block stream for the PForDelta
    block codec (functions/pfor.py) — BASELINE.json's sanctioned
    alternative. Doc order, blockmax bounds, and all decoded values are
    identical either way; only the byte encoding differs.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return b"", []
    assert np.all(np.diff(doc_ids) > 0), "doc_ids must be strictly increasing"
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    if positions_flat is not None:
        positions_flat = np.asarray(positions_flat, dtype=np.int64)
        assert positions_flat.size == int(tfs.sum()), "positions must align with tfs"
        pos_bounds = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)

    codec_id = _CODEC_IDS[codec]
    if codec_id == CODEC_PFOR:
        from find_that_charity_spark.functions.pfor import pfor_encode as _enc
        from find_that_charity_spark.functions.pfor import pfor_encode_chunked as _enc_pos
    else:
        _enc = varint_encode
        # the positions stream holds sum(tf) values per block — unbounded,
        # unlike the three <=128-value head streams. varint has no length
        # cap; pfor's uint16 count field needs chunking (pfor.py).
        _enc_pos = varint_encode
    parts: list[bytes] = [bytes([codec_id])]
    blockmax: list[tuple[int, int, int, int, int]] = []
    offset = 1  # byte 0 is the codec id
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        blk = (
            _enc(deltas[s:e])
            + _enc(tfs[s:e].astype(np.uint64))
            + _enc(dls[s:e].astype(np.uint64))
        )
        if positions_flat is not None:
            pf = positions_flat[pos_bounds[s] : pos_bounds[e]]
            blk += _enc_pos(_position_deltas(pf, tfs[s:e]))
        parts.append(blk)
        blockmax.append(
            (int(doc_ids[e - 1]), int(tfs[s:e].max()), int(dls[s:e].min()), offset, e - s)
        )
        offset += len(blk)
    return b"".join(parts), blockmax


def decode_block(
    blob: bytes | memoryview,
    offset: int,
    n: int,
    prev_last_doc: int,
    with_positions: bool = False,
) -> tuple[np.ndarray, ...]:
    """Decode one block given its blockmax entry. ``prev_last_doc`` is the
    previous block's last_doc (0 for the first block, whose first delta IS
    the doc id). With ``with_positions`` the 4th stream is decoded too and
    returned as (docs, tfs, dls, positions_flat).

    The byte scan is bounded to the block's maximum possible size
    (<=10 bytes/varint) — never the blob's remaining tail, which would
    make whole-list decode quadratic.

    The codec is read from blob byte 0 (see CODEC_*): the blob is
    self-describing, so mixed-codec segment stores decode correctly with
    no config plumbing."""
    full = np.frombuffer(blob, dtype=np.uint8)
    if int(full[0]) == CODEC_PFOR:
        from find_that_charity_spark.functions.pfor import pfor_decode_n, pfor_decode_stream

        data = full[offset:]
        deltas, used = pfor_decode_stream(data)
        assert deltas.size == n, f"corrupt pfor block: {deltas.size} deltas, expected {n}"
        tfs_u, ln = pfor_decode_stream(data[used:])
        assert tfs_u.size == n, f"corrupt pfor block: {tfs_u.size} tfs, expected {n}"
        used += ln
        dls_u, ln = pfor_decode_stream(data[used:])
        assert dls_u.size == n, f"corrupt pfor block: {dls_u.size} dls, expected {n}"
        used += ln
        tfs = tfs_u.astype(np.int64)
        dls = dls_u.astype(np.int64)
        docs = np.cumsum(deltas.astype(np.int64)) + prev_last_doc
        if not with_positions:
            return docs, tfs, dls
        # positions stream: sum(tf) values, possibly chunked across
        # multiple back-to-back pfor streams (uint16 cap — pfor.py)
        pos_deltas, _ = pfor_decode_n(data[used:], int(tfs.sum()))
        return docs, tfs, dls, _positions_from_deltas(pos_deltas, tfs)
    head_vals = 3 * n
    # varints are <=10 bytes each: a safe upper bound on the head streams
    data = full[offset : offset + 10 * head_vals]
    is_last = (data & 0x80) == 0
    ends = np.flatnonzero(is_last)
    head_end = int(ends[head_vals - 1]) + 1
    vals = varint_decode(data[:head_end], count=head_vals)
    deltas = vals[:n].astype(np.int64)
    tfs = vals[n : 2 * n].astype(np.int64)
    dls = vals[2 * n :].astype(np.int64)
    docs = np.cumsum(deltas) + prev_last_doc
    if not with_positions:
        return docs, tfs, dls
    n_pos = int(tfs.sum())
    pos_data = full[offset + head_end : offset + head_end + 10 * n_pos]
    pos_last = np.flatnonzero((pos_data & 0x80) == 0)
    pos_bytes = pos_data[: int(pos_last[n_pos - 1]) + 1]
    pos_deltas = varint_decode(pos_bytes, count=n_pos)
    positions = _positions_from_deltas(pos_deltas, tfs)
    return docs, tfs, dls, positions


def decode_postings(
    blob: bytes | memoryview,
    blockmax: list[tuple[int, int, int, int, int]],
    with_positions: bool = False,
) -> tuple[np.ndarray, ...]:
    """Decode a full posting list (all blocks)."""
    docs_l, tfs_l, dls_l, pos_l = [], [], [], []
    prev = 0
    for last_doc, _max_tf, _min_dl, offset, n in blockmax:
        out = decode_block(blob, offset, n, prev, with_positions=with_positions)
        assert out[0][-1] == last_doc, "corrupt block: last_doc mismatch"
        docs_l.append(out[0])
        tfs_l.append(out[1])
        dls_l.append(out[2])
        if with_positions:
            pos_l.append(out[3])
        prev = last_doc
    if not docs_l:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty, empty, empty) if with_positions else (empty, empty, empty)
    base = (
        np.concatenate(docs_l),
        np.concatenate(tfs_l),
        np.concatenate(dls_l),
    )
    if with_positions:
        return (*base, np.concatenate(pos_l))
    return base
