"""Batch-vectorized MD5 (RFC 1321) — thousands of short messages hashed
in one numpy pass.

The dedup signature kernels (operators/dedup.py) need md5 SEMANTICS —
the DuckDB oracle recomputes the same signatures via ``md5_number_upper``,
which equals the little-endian uint64 read of the first 8 digest bytes —
but per-shingle ``hashlib.md5`` calls in a Python loop were the dominant
dedup CPU (VERDICT r03). MD5's compression function is trivially SIMD
over the *message* axis: all lanes run the same 64 rounds, only the data
differs. This module runs it over an (n_messages,) uint32 lane set:

    pad all messages          one scatter via the arange-minus-repeat trick
    group by block count      short shingles are 1 block; groups run the
                              rounds without masking
    64 rounds x uint32 ops    wraparound arithmetic is native to np.uint32

Only the first 8 digest bytes (= A, B registers) are materialized — the
signature kernels never need the rest.

Throughput: ~10-40x over a hashlib loop for short messages (measured in
benchmarks/bench_micro.py) — hashlib's per-call Python overhead dwarfs
its C digest time at shingle sizes.
"""

from __future__ import annotations

import numpy as np

# per-round left-rotate amounts (RFC 1321 §3.4)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# K[i] = floor(abs(sin(i+1)) * 2^32)
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * (2.0**32)).astype(
    np.uint64
).astype(np.uint32)
# message-word index per round
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


_CHUNK = 16_384  # lanes per core call: 64 rounds x ~10 temporaries stay in L2


def _md5_core(m_words: np.ndarray) -> np.ndarray:
    """Chunked driver for :func:`_md5_core_chunk` — processing bounded
    lane counts keeps every round temporary cache-resident (measured ~2x
    over one monolithic pass at 10^5+ lanes)."""
    n = m_words.shape[0]
    if n <= _CHUNK:
        return _md5_core_chunk(m_words)
    out = np.empty(n, dtype=np.uint64)
    for s in range(0, n, _CHUNK):
        out[s : s + _CHUNK] = _md5_core_chunk(m_words[s : s + _CHUNK])
    return out


def _md5_core_chunk(m_words: np.ndarray) -> np.ndarray:
    """Digest prefix for a (n, n_blocks, 16) uint32 message-word tensor.
    Returns uint64 = A | B << 32 (little-endian first 8 digest bytes)."""
    n = m_words.shape[0]
    a0 = np.full(n, 0x67452301, dtype=np.uint32)
    b0 = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c0 = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d0 = np.full(n, 0x10325476, dtype=np.uint32)
    for blk in range(m_words.shape[1]):
        w = m_words[:, blk, :]
        a, b, c, d = a0.copy(), b0.copy(), c0.copy(), d0.copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            f = f + a + _K[i] + w[:, _G[i]]
            a, d, c = d, c, b
            b = b + _rotl(f, int(_S[i]))
        a0 += a
        b0 += b
        c0 += c
        d0 += d
    return a0.astype(np.uint64) | (b0.astype(np.uint64) << np.uint64(32))


def md5_u64(concat: bytes, lengths: np.ndarray) -> np.ndarray:
    """MD5-prefix (first 8 digest bytes, little-endian uint64) of each of
    the messages packed back-to-back in ``concat`` with byte ``lengths``.

    Bit-identical to ``int.from_bytes(hashlib.md5(m).digest()[:8],
    'little')`` per message (property-tested), and to DuckDB's
    ``md5_number_upper`` — the oracle contract the dedup kernels pin."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n = lengths.size
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    data = np.frombuffer(concat, dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    nblocks = (lengths + 8) // 64 + 1  # room for 0x80 pad + 8-byte bitlen
    for nb in np.unique(nblocks):
        idx = np.flatnonzero(nblocks == nb)
        m = idx.size
        li = lengths[idx]
        padded = np.zeros((m, int(nb) * 64), dtype=np.uint8)
        total = int(li.sum())
        if total:
            # arange-minus-repeat: per-message byte index, then offset into
            # the flat source/destination — one gather + one scatter
            cum = np.concatenate([[0], np.cumsum(li)[:-1]])
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, li)
            src = within + np.repeat(starts[idx], li)
            dst = within + np.repeat(np.arange(m, dtype=np.int64) * int(nb) * 64, li)
            padded.reshape(-1)[dst] = data[src]
        padded[np.arange(m), li] = 0x80
        bitlen = li.astype(np.uint64) * np.uint64(8)
        shifts = (np.arange(8, dtype=np.uint64) * np.uint64(8))[None, :]
        padded[:, -8:] = ((bitlen[:, None] >> shifts) & np.uint64(0xFF)).astype(np.uint8)
        words = (
            np.ascontiguousarray(padded)
            .view(np.dtype("<u4"))
            .reshape(m, int(nb), 16)
        )
        out[idx] = _md5_core(words)
    return out


def md5_u64_of_strs(strs) -> np.ndarray:
    """md5_u64 over an iterable of str (utf-8 encoded)."""
    encoded = [s.encode("utf-8") for s in strs]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
    return md5_u64(b"".join(encoded), lengths)
