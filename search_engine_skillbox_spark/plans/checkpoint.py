"""Per-partition lineage + metrics and resumable builds (north rule).

The reference tracks one status row per site — INDEXING/INDEXED/FAILED +
statusTime + lastError (model/SiteEntity.java:11-30, lifecycle at
service/IndexingServiceImpl.java:218-284). The engine generalizes that to
one lineage row per build partition (term-bucket group):

    (build_id, partition_id, status, started_at, finished_at,
     rows, bytes, error)

A restarted build skips partitions whose lineage row is DONE — the
sandbox stand-in for Iceberg's atomic snapshot commits (each partition's
parquet dir is written fully before its DONE row lands; a crash between
the two re-runs that partition, which is idempotent because the write
mode is overwrite-by-partition).

Storage is a JSON-lines file appended atomically (os.O_APPEND single
write per row ≤ PIPE_BUF) — driver-side only, a few rows per build.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class LineageRow:
    build_id: str
    partition_id: str
    status: str  # RUNNING | DONE | FAILED
    started_at: float
    finished_at: float | None = None
    rows: int | None = None
    bytes: int | None = None
    error: str | None = None


class Lineage:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def _append(self, row: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row) + "\n")

    def load(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    def done_partitions(self, build_id: str) -> set[str]:
        return {r["partition_id"] for r in self.load()
                if r["build_id"] == build_id and r["status"] == "DONE"}

    def start(self, build_id: str, partition_id: str) -> float:
        t = time.time()
        self._append({"build_id": build_id, "partition_id": partition_id,
                      "status": "RUNNING", "started_at": t})
        return t

    def done(self, build_id: str, partition_id: str, started_at: float,
             rows: int, nbytes: int) -> None:
        self._append({"build_id": build_id, "partition_id": partition_id,
                      "status": "DONE", "started_at": started_at,
                      "finished_at": time.time(), "rows": rows,
                      "bytes": nbytes})

    def failed(self, build_id: str, partition_id: str, started_at: float,
               error: str) -> None:
        # mirrors the reference's FAILED(lastError) status
        # (IndexingServiceImpl.java:264-284)
        self._append({"build_id": build_id, "partition_id": partition_id,
                      "status": "FAILED", "started_at": started_at,
                      "finished_at": time.time(), "error": error[:2000]})
