"""On-disk format version stamp (ADVICE r03): builds write format.json;
readers and streaming appends fail fast on unstamped / mismatched stores
instead of misrouting decode on the codec-id byte."""

from __future__ import annotations

import json
import os

import pytest

from find_that_charity_spark.functions.codec import FORMAT_VERSION
from find_that_charity_spark.plans.checkpoint import check_format, write_format


def test_write_then_check_roundtrip(tmp_path):
    d = str(tmp_path / "idx")
    write_format(d)
    check_format(d)  # no raise
    with open(os.path.join(d, "format.json")) as f:
        assert json.load(f) == {"format_version": FORMAT_VERSION}
    write_format(d)  # idempotent


def test_unstamped_store_rejected(tmp_path):
    d = str(tmp_path / "old_idx")
    os.makedirs(d)
    with pytest.raises(RuntimeError, match="format.json"):
        check_format(d)


def test_version_mismatch_rejected(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    with open(os.path.join(d, "format.json"), "w") as f:
        json.dump({"format_version": FORMAT_VERSION - 1}, f)
    with pytest.raises(RuntimeError, match="Rebuild"):
        check_format(d)
    with pytest.raises(RuntimeError, match="Rebuild"):
        write_format(d)  # refuse to append onto an older store


def test_remote_paths_skipped():
    check_format("s3://bucket/index")  # no raise: remote guard is Iceberg's job


def test_query_path_rejects_unstamped(tmp_path, spark):
    """load_stats (the shared query entry) carries the check."""
    from find_that_charity_spark.operators.query import load_stats

    d = str(tmp_path / "idx")
    os.makedirs(d)
    with pytest.raises(RuntimeError, match="pre-versioning"):
        load_stats(spark, d)


def test_file_scheme_forms_accepted(tmp_path):
    """ADVICE r04 (low): Hadoop accepts both file:///p and file:/p; the
    single-slash form must resolve to the same local dir (a fixed [7:]
    slice used to mangle it into a spurious 'no format.json')."""
    from find_that_charity_spark.plans.checkpoint import strip_file_scheme

    d = str(tmp_path / "idx")
    os.makedirs(d)
    write_format(d)
    assert strip_file_scheme(f"file://{d}") == d
    assert strip_file_scheme(f"file:{d}") == d
    assert strip_file_scheme(d) == d
    assert strip_file_scheme("s3://bucket/x") == "s3://bucket/x"
    check_format(f"file://{d}")
    check_format(f"file:{d}")  # the r04 bug: raised RuntimeError here
