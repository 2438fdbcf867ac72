"""Build checkpointing: per-partition lineage + metrics manifest (C13/C14).

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics". Spark's own checkpointing is lineage truncation inside
one job — not job-level idempotent restart — so the build keeps its own
manifest: an append-only JSONL file under the index directory, written
atomically (tmp + rename). Each entry records a completed unit of work
(a stage, or one bucket-chunk of the segment write) with its inputs,
row/posting counts, and wall time. On restart, completed units are skipped
and their outputs trusted; interrupted units left no output (Spark job
commits are all-or-nothing via the _temporary protocol), so a rerun is
idempotent and the final index is byte-identical to an uninterrupted run
(tested: tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any


def strip_file_scheme(path: str) -> str:
    """Local-FS form of a Hadoop path: both accepted spellings
    ``file:///p`` / ``file:/p`` map to ``/p`` (ADVICE r04: a fixed
    ``[7:]`` slice turned the single-slash form into garbage). Non-file
    schemes pass through untouched (callers detect them via '://')."""
    if path.startswith("file://"):
        return path[7:]
    if path.startswith("file:"):
        return path[5:]
    return path


def write_format(index_dir: str) -> None:
    """Stamp the on-disk format version (codec.FORMAT_VERSION) into
    ``<index_dir>/format.json``. Idempotent; called at build start so even
    an interrupted build leaves a version-stamped store."""
    from find_that_charity_spark.functions.codec import FORMAT_VERSION

    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, "format.json")
    if os.path.exists(path):
        check_format(index_dir)  # refuse to append onto an older store
        return
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"format_version": FORMAT_VERSION}, f)
    os.replace(tmp, path)


def check_format(index_dir: str) -> None:
    """Fail fast (with a rebuild hint) when ``index_dir`` was written by a
    different on-disk format version, or predates version stamping.

    A pre-v2 blob has no codec-id byte: its first varint byte (often 0x01)
    would silently misroute decode to the PFOR path. Remote paths (scheme
    prefix other than file:) skip the check — the stamp is a local-store
    guard; a cluster deployment would carry it in the Iceberg table
    properties instead."""
    from find_that_charity_spark.functions.codec import FORMAT_VERSION

    local = strip_file_scheme(index_dir)
    if "://" in local:
        return
    path = os.path.join(local, "format.json")
    if not os.path.exists(path):
        raise RuntimeError(
            f"index at {index_dir} has no format.json — it was written by a "
            f"pre-versioning build whose postings layout (no codec-id byte) "
            f"this reader cannot safely decode. Rebuild the index with "
            f"build_index()."
        )
    with open(path) as f:
        found = json.load(f).get("format_version")
    if found != FORMAT_VERSION:
        raise RuntimeError(
            f"index at {index_dir} is format v{found}; this reader requires "
            f"v{FORMAT_VERSION}. Rebuild the index with build_index()."
        )


class Manifest:
    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "manifest.jsonl")
        os.makedirs(index_dir, exist_ok=True)

    def entries(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def done_units(self) -> set[tuple[str, str]]:
        return {
            (e["stage"], str(e.get("unit", "")))
            for e in self.entries()
            if e.get("status") == "done"
        }

    def is_done(self, stage: str, unit: str = "") -> bool:
        return (stage, str(unit)) in self.done_units()

    def mark_done(self, stage: str, unit: str = "", **metrics: Any) -> None:
        entry = {
            "stage": stage,
            "unit": str(unit),
            "status": "done",
            "ts": time.time(),
            **metrics,
        }
        # atomic append: rewrite to tmp, rename over (small file, driver-side)
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
        existing = self.entries()
        with open(tmp, "w") as f:
            for e in [*existing, entry]:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self.path)
