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
