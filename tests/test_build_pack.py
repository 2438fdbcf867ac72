"""Packed shuffle-row layout (build.tf_table / _encode_group).

The inversion shuffle carries docdl = doc_id << _DL_BITS | dl and
gkey = bucket << 32 | salt instead of four separate columns; these tests
pin the pack/unpack arithmetic at edge values and the loud-failure
bounds guard. Segment-byte equivalence with the historical unpacked
layout is covered transitively by every index/oracle test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from find_that_charity_spark.functions.codec import decode_postings
from find_that_charity_spark.operators.build import (
    _DL_BITS,
    _encode_group,
    check_pack_bounds,
)


def _pack(doc_id: int, dl: int) -> int:
    return (doc_id << _DL_BITS) | dl


def test_check_pack_bounds():
    check_pack_bounds(0, 0)
    check_pack_bounds((1 << _DL_BITS) - 1, 10**12)
    with pytest.raises(ValueError, match="packed-shuffle limit"):
        check_pack_bounds(1 << _DL_BITS, 10)
    with pytest.raises(ValueError, match="doc_id packed-shuffle limit"):
        check_pack_bounds(10, 1 << 62)


def test_encode_group_unpacks_edge_values():
    """Max in-bounds dl and a large doc_id survive the pack roundtrip."""
    max_dl = (1 << _DL_BITS) - 1
    big_doc = (1 << 40) + 17
    gkey = (5 << 32) | 3
    rows = [
        # (term, docdl): doc big_doc has the maximum doc length; the same
        # term also appears twice in doc big_doc+1 (tf run-length check)
        ("alpha", _pack(big_doc, max_dl)),
        ("alpha", _pack(big_doc + 1, 2)),
        ("alpha", _pack(big_doc + 1, 2)),
        ("beta", _pack(big_doc, max_dl)),
    ]
    pdf = pd.DataFrame(
        {
            "docdl": np.array([r[1] for r in rows], dtype=np.int64),
            "term": [r[0] for r in rows],
            "gkey": np.int64(gkey),
        }
    )
    out = _encode_group()(pdf).sort_values("term").reset_index(drop=True)
    assert list(out["term"]) == ["alpha", "beta"]
    assert list(out["bucket"]) == [5, 5]
    assert list(out["salt"]) == [3, 3]

    def _bm(row):
        return [
            (d["last_doc"], d["max_tf"], d["min_dl"], d["offset"], d["n"])
            for d in row
        ]

    docs, tfs, dls = decode_postings(out["postings"][0], _bm(out["blockmax"][0]))
    assert docs.tolist() == [big_doc, big_doc + 1]
    assert tfs.tolist() == [1, 2]
    assert dls.tolist() == [max_dl, 2]
    assert out["df"][0] == 2 and out["cf"][0] == 3
    assert out["min_doc"][0] == big_doc and out["max_doc"][0] == big_doc + 1

    docs_b, tfs_b, dls_b = decode_postings(
        out["postings"][1], _bm(out["blockmax"][1])
    )
    assert docs_b.tolist() == [big_doc]
    assert dls_b.tolist() == [max_dl]
