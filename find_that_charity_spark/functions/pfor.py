"""PForDelta (NewPFD-style) block codec — the BASELINE.json-sanctioned
alternative to delta+varint for posting blocks (SURVEY.md §2B B6 names
"delta+varint/PForDelta"; see Zukowski et al., "Super-Scalar RAM-CPU
Cache Compression", ICDE 2006, and Yan/Ding/Suel WWW 2009 NewPFD).

Layout per encoded array (one posting-block stream, <=128 values):

    byte 0      bit width b (0..64)
    byte 1-2    n values (uint16 LE)
    byte 3-4    n exceptions (uint16 LE)
    packed      ceil(n*b/8) bytes: low b bits of every value, LSB-first
    exc pos     varint deltas of exception indices (ascending)
    exc high    varint of (value >> b) for each exception

The width is chosen to make ~90% of values fit (NewPFD's patch scheme):
outliers store their overflow bits out-of-line, so one huge delta cannot
inflate the whole block the way fixed-width FOR would.

Everything is numpy-vectorized (np.packbits/np.unpackbits on a bit
matrix); no per-value Python. The codec is roundtrip-property-tested
(tests/test_pfor.py) and integrated into the segment store behind
``BuildConfig.block_codec="pfor"``: postings blobs are self-describing
(codec id in byte 0 — functions/codec.py), so query/compaction paths
decode mixed-codec stores with no config plumbing, and an index built
with either codec yields byte-identical query results
(tests/test_pfor_integration.py). varint stays the default.
"""

from __future__ import annotations

import numpy as np

from find_that_charity_spark.functions.codec import varint_decode, varint_encode

_PATCH_FRACTION = 0.90  # NewPFD: width covers ~90th percentile


def _bit_width(values: np.ndarray) -> int:
    """Smallest b such that value < 2**b (0 for an all-zero array)."""
    m = int(values.max()) if values.size else 0
    return m.bit_length()


def pfor_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array (<=65535 values) as one PForDelta stream."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n > 0xFFFF:
        raise ValueError("pfor_encode is a block codec (<=65535 values)")
    if n == 0:
        return bytes([0, 0, 0, 0, 0])
    # candidate width: 90th-percentile bit length; widen if exceptions
    # would cost more than the saved packed bits (cheap scan over widths)
    widths = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    while np.any(tmp):
        widths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(1)
    b = int(np.quantile(widths, _PATCH_FRACTION, method="lower"))
    b = max(b, 1) if int(v.max()) > 0 else 0
    full = _bit_width(v)
    best_b, best_cost = None, None
    for cand in range(b, full + 1):
        n_exc = int((widths > cand).sum())
        cost = (n * cand + 7) // 8 + n_exc * 3  # ~3 B/exception estimate
        if best_cost is None or cost < best_cost:
            best_b, best_cost = cand, cost
    b = best_b
    exc_idx = np.flatnonzero(widths > b)
    header = bytes([b]) + int(n).to_bytes(2, "little") + int(exc_idx.size).to_bytes(2, "little")
    if b == 0:
        packed = b""
    else:
        low = v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1)) if b < 64 else v
        # bit matrix (n, b), LSB-first, then packbits along the flat axis
        shifts = np.arange(b, dtype=np.uint64)
        bits = ((low[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    if exc_idx.size:
        pos_deltas = np.empty(exc_idx.size, dtype=np.uint64)
        pos_deltas[0] = exc_idx[0]
        pos_deltas[1:] = np.diff(exc_idx).astype(np.uint64)
        high = v[exc_idx] >> np.uint64(b)
        exc = varint_encode(pos_deltas) + varint_encode(high)
    else:
        exc = b""
    return header + packed + exc


def pfor_encode_chunked(values: np.ndarray) -> bytes:
    """Encode an arbitrarily long uint64 array as back-to-back pfor
    streams of <=65535 values each.

    The block codec's uint16 count field caps one stream at 65535 values;
    a positions stream holds sum(tf) entries per posting block, which is
    unbounded (128 postings with tf=600 each already overflows). Streams
    are self-delimiting, so the decoder (:func:`pfor_decode_n`) walks
    chunks until the expected value count is reached. Arrays <=65535
    values encode byte-identically to a single :func:`pfor_encode` call,
    so existing stores stay readable."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size <= 0xFFFF:
        return pfor_encode(v)
    return b"".join(pfor_encode(v[s : s + 0xFFFF]) for s in range(0, v.size, 0xFFFF))


def pfor_decode_n(data: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Decode back-to-back pfor streams starting at ``data[0]`` until
    exactly ``n`` values are read; returns (values, consumed bytes).

    Inverse of :func:`pfor_encode_chunked`. A count mismatch (stream
    boundary not landing exactly on ``n``) means corruption and raises."""
    if n == 0:
        # the encoder writes one explicit empty stream for size-0 input
        vals, used = pfor_decode_stream(data)
        assert vals.size == 0, f"expected empty pfor stream, got {vals.size} values"
        return vals, used
    out: list[np.ndarray] = []
    used = 0
    got = 0
    while got < n:
        vals, ln = pfor_decode_stream(data[used:])
        assert vals.size > 0, "zero-length pfor chunk inside a non-empty stream"
        out.append(vals)
        used += ln
        got += vals.size
    assert got == n, f"pfor chunked stream has {got} values, expected {n}"
    return (out[0] if len(out) == 1 else np.concatenate(out)), used


def pfor_stream_len(data: np.ndarray) -> int:
    """Byte length of the pfor stream starting at ``data[0]`` (a uint8
    array). Streams are self-delimiting: header gives n/width/exceptions,
    the exception tail is 2*n_exc varints found by a continuation-bit
    scan bounded to 10 bytes/varint."""
    b = int(data[0])
    n = int(data[1]) | (int(data[2]) << 8)
    n_exc = int(data[3]) | (int(data[4]) << 8)
    off = 5 + ((n * b + 7) // 8 if n else 0)
    if n_exc:
        cap = 10 * 2 * n_exc
        is_last = (data[off : off + cap] & 0x80) == 0
        ends = np.flatnonzero(is_last)
        off += int(ends[2 * n_exc - 1]) + 1
    return off


def pfor_decode_stream(data: np.ndarray) -> tuple[np.ndarray, int]:
    """Decode the pfor stream at ``data[0]``; returns (values, consumed
    bytes) so back-to-back streams can be walked."""
    ln = pfor_stream_len(data)
    return pfor_decode(data[:ln]), ln


def pfor_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode one PForDelta stream back to uint64."""
    data = np.frombuffer(buf, dtype=np.uint8)
    b = int(data[0])
    n = int(data[1]) | (int(data[2]) << 8)
    n_exc = int(data[3]) | (int(data[4]) << 8)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off = 5
    if b == 0:
        vals = np.zeros(n, dtype=np.uint64)
    else:
        # unpackbits + (n, b) weighted sum. An unaligned-window gather
        # variant (sliding_window_view + fancy index) was measured 3x
        # SLOWER at the real operating granularity (128-value blocks) —
        # its per-call allocation overhead only amortizes for n >> 10^3,
        # which decode_block never sees. Keep the simple path.
        packed_len = (n * b + 7) // 8
        bits = np.unpackbits(
            data[off : off + packed_len], bitorder="little", count=n * b
        ).astype(np.uint64)
        shifts = np.arange(b, dtype=np.uint64)
        vals = (bits.reshape(n, b) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        off += packed_len
    if n_exc:
        tail = varint_decode(data[off:], count=2 * n_exc)
        idx = np.cumsum(tail[:n_exc].astype(np.int64))
        high = tail[n_exc:]
        vals[idx] |= high << np.uint64(b)
    return vals
