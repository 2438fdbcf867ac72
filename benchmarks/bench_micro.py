"""Micro-benchmarks (BASELINE.md: codec, intersect, WAND inner loop).

Run separately from the correctness gate:

    python -m pytest benchmarks/bench_micro.py -q

Uses pytest-benchmark when available; falls back to plain timing asserts.
"""

from __future__ import annotations

import numpy as np
import pytest

from find_that_charity_spark.functions.bm25 import idf_np
from find_that_charity_spark.functions.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from find_that_charity_spark.operators.query import (
    _make_cursor,
    _member_mask,
    score_query_bmw,
)

N = 1_000_000


@pytest.fixture(scope="module")
def postings():
    rng = np.random.default_rng(5)
    docs = np.cumsum(rng.integers(1, 20, size=N)).astype(np.int64)
    tfs = rng.integers(1, 9, size=N).astype(np.int64)
    dls = rng.integers(8, 500, size=N).astype(np.int64)
    return docs, tfs, dls


def test_varint_encode_throughput(benchmark, postings):
    docs, _, _ = postings
    vals = docs.astype(np.uint64)
    out = benchmark(varint_encode, vals)
    assert len(out) > 0


def test_varint_decode_throughput(benchmark, postings):
    docs, _, _ = postings
    buf = varint_encode(docs.astype(np.uint64))
    out = benchmark(varint_decode, buf)
    assert out.size == N


def test_postings_encode_throughput(benchmark, postings):
    docs, tfs, dls = postings
    blob, bm = benchmark(encode_postings, docs, tfs, dls)
    assert len(bm) == (N + 127) // 128


def test_postings_decode_throughput(benchmark, postings):
    docs, tfs, dls = postings
    blob, bm = encode_postings(docs, tfs, dls)
    d, _, _ = benchmark(decode_postings, blob, bm)
    assert d.size == N


def test_galloping_intersect_throughput(benchmark):
    rng = np.random.default_rng(6)
    big = np.sort(rng.choice(50_000_000, size=N, replace=False)).astype(np.int64)
    small = np.sort(rng.choice(big, size=10_000, replace=False)).astype(np.int64)
    mask = benchmark(_member_mask, big, small)
    assert mask.all()


def test_wand_query_throughput(benchmark, postings):
    docs, tfs, dls = postings
    avgdl = 250.0
    blob, bm = encode_postings(docs, tfs, dls)
    bm_d = [
        {"last_doc": ld, "max_tf": mt, "min_dl": md, "offset": off, "n": n}
        for ld, mt, md, off, n in bm
    ]
    idf = float(idf_np(2 * N, N))

    def run():
        c = _make_cursor(idf, blob, bm_d, avgdl)
        return score_query_bmw([c], k=10, avgdl=avgdl)

    out = benchmark(run)
    assert len(out) == 10
