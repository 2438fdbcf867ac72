"""PForDelta codec: roundtrip properties + size comparison vs varint."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from find_that_charity_spark.functions.codec import varint_encode
from find_that_charity_spark.functions.pfor import pfor_decode, pfor_encode


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_arbitrary(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = pfor_decode(pfor_encode(arr))
    assert out.tolist() == arr.tolist()


@given(st.integers(min_value=0, max_value=2**20), st.integers(min_value=1, max_value=128))
@settings(max_examples=50, deadline=None)
def test_roundtrip_constant_blocks(value, n):
    arr = np.full(n, value, dtype=np.uint64)
    assert pfor_decode(pfor_encode(arr)).tolist() == arr.tolist()


def test_roundtrip_outlier_patches():
    """One huge delta must not widen the whole block (the PFor point)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(1, 30, 128).astype(np.uint64)
    arr[17] = 2**40  # a single 41-bit outlier among 5-bit values
    blob = pfor_encode(arr)
    assert pfor_decode(blob).tolist() == arr.tolist()
    # packed width stays near the 5-bit body, not 41 bits
    assert blob[0] <= 8
    assert len(blob) < 128 * 2  # far below fixed-width-41 (~656 B)


def test_smaller_than_varint_on_dense_deltas():
    """Posting-gap-like data (small Zipf deltas): PFor beats varint's
    1-byte-per-value floor."""
    rng = np.random.default_rng(7)
    deltas = (rng.zipf(1.6, 128) % 60 + 1).astype(np.uint64)
    p = len(pfor_encode(deltas))
    v = len(varint_encode(deltas))
    assert p < v, (p, v)


def test_decode_speed_sane():
    """Vectorized decode: a million values in well under a second."""
    import time

    rng = np.random.default_rng(11)
    blocks = [
        pfor_encode((rng.zipf(1.5, 128) % 1000).astype(np.uint64)) for _ in range(8000)
    ]
    t0 = time.perf_counter()
    n = sum(pfor_decode(b).size for b in blocks)
    wall = time.perf_counter() - t0
    assert n == 8000 * 128
    assert wall < 2.0, wall


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**40),   # doc gap
            st.integers(min_value=1, max_value=1000),    # tf
            st.integers(min_value=1, max_value=2**21),   # dl
        ),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=100, deadline=None)
def test_cross_codec_postings_equality(rows):
    """encode_postings(codec='pfor') and (codec='varint') must decode to
    identical postings with identical blockmax bounds — the property the
    integrated store equivalence (test_pfor_integration.py) rests on."""
    from find_that_charity_spark.functions.codec import (
        decode_postings,
        encode_postings,
    )

    gaps = np.array([r[0] for r in rows], dtype=np.int64)
    docs = np.cumsum(gaps)
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    b_v, m_v = encode_postings(docs, tfs, dls, codec="varint")
    b_p, m_p = encode_postings(docs, tfs, dls, codec="pfor")
    # blockmax bounds identical (offsets may differ — byte layouts differ)
    assert [(a[0], a[1], a[2], a[4]) for a in m_v] == [
        (a[0], a[1], a[2], a[4]) for a in m_p
    ]
    out_v = decode_postings(b_v, m_v)
    out_p = decode_postings(b_p, m_p)
    for a, b in zip(out_v, out_p):
        assert np.array_equal(a, b)

def test_chunked_encode_identity_under_cap():
    """<=65535 values: chunked encode is byte-identical to single-stream —
    stores written before chunking existed stay readable."""
    from find_that_charity_spark.functions.pfor import pfor_decode_n, pfor_encode_chunked

    rng = np.random.default_rng(13)
    arr = (rng.zipf(1.5, 5000) % 1000).astype(np.uint64)
    assert pfor_encode_chunked(arr) == pfor_encode(arr)
    vals, used = pfor_decode_n(np.frombuffer(pfor_encode_chunked(arr), dtype=np.uint8), arr.size)
    assert used == len(pfor_encode(arr))
    assert vals.tolist() == arr.tolist()


def test_chunked_roundtrip_over_cap():
    """>65535 values round-trip through back-to-back streams."""
    from find_that_charity_spark.functions.pfor import pfor_decode_n, pfor_encode_chunked

    rng = np.random.default_rng(17)
    arr = (rng.zipf(1.4, 200_000) % 5000).astype(np.uint64)
    blob = pfor_encode_chunked(arr)
    data = np.frombuffer(blob, dtype=np.uint8)
    vals, used = pfor_decode_n(data, arr.size)
    assert used == len(blob)
    assert vals.tolist() == arr.tolist()


def test_positions_stream_over_uint16_cap():
    """ADVICE r03 (medium): 128 postings x tf=600 = 76,800 positions per
    block — over pfor's uint16 per-stream cap. Build + decode must work
    under codec='pfor' with positions=True (the driver-gate setting)."""
    from find_that_charity_spark.functions.codec import decode_postings, encode_postings

    n = 128
    tf = 600
    docs = np.arange(1, n + 1, dtype=np.int64) * 3
    tfs = np.full(n, tf, dtype=np.int64)
    dls = np.full(n, tf * 2, dtype=np.int64)
    rng = np.random.default_rng(19)
    # ascending positions per posting: cumsum of positive gaps per row
    pos = np.cumsum(rng.integers(1, 5, size=(n, tf)), axis=1).reshape(-1).astype(np.int64)
    for codec in ("varint", "pfor"):
        blob, bm = encode_postings(docs, tfs, dls, positions_flat=pos, codec=codec)
        d, t, l, p = decode_postings(blob, bm, with_positions=True)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(l, dls)
        assert np.array_equal(p, pos)


@given(
    st.integers(min_value=1, max_value=128),
    st.integers(min_value=400, max_value=900),
)
@settings(max_examples=10, deadline=None)
def test_positions_large_tf_property(n, tf):
    """Property form of the uint16-cap fix: any (n, tf) with n*tf possibly
    exceeding 65535 round-trips under both codecs."""
    from find_that_charity_spark.functions.codec import decode_postings, encode_postings

    docs = np.arange(1, n + 1, dtype=np.int64)
    tfs = np.full(n, tf, dtype=np.int64)
    dls = tfs * 2
    pos = np.tile(np.arange(tf, dtype=np.int64) * 2 + 1, n)
    for codec in ("varint", "pfor"):
        blob, bm = encode_postings(docs, tfs, dls, positions_flat=pos, codec=codec)
        out = decode_postings(blob, bm, with_positions=True)
        assert np.array_equal(out[3], pos)
