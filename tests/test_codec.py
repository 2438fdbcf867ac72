"""Codec property tests (SURVEY.md §5.3, FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pytest

from find_that_charity_spark.functions.bm25 import bm25_term_score_np, idf_np
from find_that_charity_spark.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_postings,
    encode_postings,
    tfnorm,
    varint_decode,
    varint_encode,
)


def _roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert out.dtype == np.uint64
    assert np.array_equal(out, arr), (arr, out)


def test_varint_edges():
    _roundtrip([])
    _roundtrip([0])
    _roundtrip([1])
    _roundtrip([127, 128, 129])
    _roundtrip([2**31 - 1, 2**31, 2**31 + 1])
    _roundtrip([2**53 - 1, 2**53, 2**53 + 1])
    _roundtrip([2**64 - 1])
    _roundtrip([0] * 1000)


def test_varint_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        bits = int(rng.integers(1, 64))
        vals = rng.integers(0, 2**bits, size=n, dtype=np.uint64)
        _roundtrip(vals)


def test_varint_reference_scalar():
    """Vectorized encoder == the obvious scalar LEB128 reference."""

    def scalar_encode(vals):
        out = bytearray()
        for v in vals:
            v = int(v)
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**40, size=500, dtype=np.uint64)
    assert varint_encode(vals) == scalar_encode(vals)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 4096, 4097])
def test_postings_roundtrip_lengths(n):
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(10 * n + 10, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(8, 500, size=n).astype(np.int64)
    blob, bm = encode_postings(docs, tfs, dls)
    assert len(bm) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    d, t, dl = decode_postings(blob, bm)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(dl, dls)


def test_postings_empty():
    blob, bm = encode_postings(np.array([], dtype=np.int64), np.array([]), np.array([]))
    assert blob == b"" and bm == []
    d, t, dl = decode_postings(blob, bm)
    assert d.size == 0


def test_postings_max_gap():
    docs = np.array([0, 2**31, 2**53], dtype=np.int64)
    tfs = np.array([1, 1, 1], dtype=np.int64)
    dls = np.array([10, 10, 10], dtype=np.int64)
    blob, bm = encode_postings(docs, tfs, dls)
    d, _, _ = decode_postings(blob, bm)
    assert np.array_equal(d, docs)


def test_block_decode_by_offset():
    """Blocks decode independently via (offset, n, prev_last_doc) — the
    skip path BMW relies on."""
    n = 1000
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(100000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=n).astype(np.int64)
    dls = rng.integers(8, 120, size=n).astype(np.int64)
    blob, bm = encode_postings(docs, tfs, dls)
    prev = 0
    for i, (last_doc, _mt, _md, off, cnt) in enumerate(bm):
        d, t, dl = decode_block(blob, off, cnt, prev)
        s = i * BLOCK_SIZE
        assert np.array_equal(d, docs[s : s + cnt])
        assert np.array_equal(t, tfs[s : s + cnt])
        assert np.array_equal(dl, dls[s : s + cnt])
        prev = last_doc


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_postings_with_positions_roundtrip(n):
    rng = np.random.default_rng(n + 99)
    docs = np.sort(rng.choice(50 * n + 10, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 7, size=n).astype(np.int64)
    dls = rng.integers(8, 200, size=n).astype(np.int64)
    pos = np.concatenate(
        [np.sort(rng.choice(1000, size=t, replace=False)) for t in tfs]
    ).astype(np.int64)
    blob, bm = encode_postings(docs, tfs, dls, positions_flat=pos)
    d, t, dl, p = decode_postings(blob, bm, with_positions=True)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(dl, dls)
    assert np.array_equal(p, pos)
    # positions are skippable: decoding WITHOUT them still works
    d2, t2, _ = decode_postings(blob, bm)
    assert np.array_equal(d2, docs) and np.array_equal(t2, tfs)


def test_blockmax_upper_bound_property():
    """idf * tfnorm(max_tf, min_dl, avgdl) >= any true block score for ANY
    (N, df, avgdl) — the property that keeps BMW pruning exact even when
    corpus stats drift after incremental appends (FIXTURES.md §4)."""
    rng = np.random.default_rng(42)
    for _case in range(50):
        n = int(rng.integers(1, 700))
        docs = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = (rng.zipf(1.5, size=n) % 100 + 1).astype(np.int64)
        dls = rng.integers(8, 1000, size=n).astype(np.int64)
        blob, bm = encode_postings(docs, tfs, dls)
        for _grid in range(3):
            n_docs = float(rng.integers(n, 10**9))
            df = float(rng.integers(1, n_docs))
            avgdl = float(rng.uniform(20, 500))
            idf = idf_np(n_docs, df)
            true = bm25_term_score_np(tfs.astype(float), dls.astype(float), idf, avgdl)
            for i, (_ld, max_tf, min_dl, _off, cnt) in enumerate(bm):
                s = i * BLOCK_SIZE
                ub = idf * tfnorm(np.array([max_tf]), np.array([float(min_dl)]), avgdl)[0]
                assert ub >= true[s : s + cnt].max() - 1e-12
                assert max_tf == tfs[s : s + cnt].max()
                assert min_dl == dls[s : s + cnt].min()
