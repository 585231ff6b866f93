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


# parsed-row cache keyed by path: the file is APPEND-ONLY (only
# _append writes it), so load() can read just the bytes past the last
# parsed offset — without this, every incremental mutation re-parses
# the store's full mutation history (O(store age) per micro-batch on a
# long-lived stream). A replaced file (compact()'s directory swap, or a
# delete-and-rebuild at the same path) must force a full re-read: the
# guard is (inode, device, first-_HEAD_LEN-bytes) — inode alone is not
# enough because a filesystem can hand a rebuilt file the SAME inode
# number, after which an offset-based splice would stitch stale cached
# rows onto the new file's bytes (phantom DONE rows → skipped
# non-idempotent steps). The head prefix covers the first row's
# started_at timestamp, which makes two distinct lineage files
# byte-distinct in practice; appends never touch the head.
_HEAD_LEN = 256
# path → (sig, off, rows, idx). idx holds incremental indexes updated
# as new rows are parsed (ADVICE r5: get_note/done_partitions were
# linearly rescanning the full cached row list per call — O(store
# mutation history) driver work per micro-batch on a long-lived
# stream, undoing what the byte-offset parse cache bought):
#   done: build_id → {partition_id with any DONE row}
#   note: (build_id, partition_id) → latest NOTE data (append order)
#   last: (build_id, partition_id) → latest row of any status
_LINEAGE_CACHE: dict[str, tuple[tuple, int, list, dict]] = {}


def _new_idx() -> dict:
    return {"done": {}, "note": {}, "last": {}, "max_ts": 0.0}


def _index_row(idx: dict, r: dict) -> None:
    key = (r["build_id"], r["partition_id"])
    status = r["status"]
    # last-activity time covers EVERY row, including NOTE rows — a
    # lineage whose newest rows are notes still reports when it was
    # last touched (summary() status_time)
    idx["max_ts"] = max(idx["max_ts"],
                        r.get("finished_at") or r.get("started_at") or 0)
    if status == "DONE":
        idx["done"].setdefault(r["build_id"], set()).add(r["partition_id"])
    if status == "NOTE":
        idx["note"][key] = r.get("data")
        return  # NOTE rows carry no lifecycle status: excluded from
        # `last` so a recovery note appended after RUNNING cannot mask
        # a still-running partition as INDEXED
    idx["last"][key] = r


class Lineage:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def _append(self, row: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row) + "\n")

    def _load(self) -> tuple[list, dict]:
        """Parse any new bytes, refresh the cache, and return the
        (cached rows, cached indexes) pair. Callers must not mutate
        either."""
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            _LINEAGE_CACHE.pop(self.path, None)
            return [], _new_idx()
        with open(self.path, "rb") as f:
            head = f.read(_HEAD_LEN)
            sig, off, rows, idx = _LINEAGE_CACHE.get(
                self.path, (None, 0, [], _new_idx()))
            # same file ⟺ same (ino, dev) AND the cached head is a
            # byte-prefix of the current head (the cached head may be
            # shorter when the file was under _HEAD_LEN at cache time —
            # appends only ever extend it)
            same = (sig is not None
                    and sig[0] == st.st_ino and sig[1] == st.st_dev
                    and head[:len(sig[2])] == sig[2]
                    and st.st_size >= off)
            if not same:
                off, rows, idx = 0, [], _new_idx()
            if st.st_size > off:
                f.seek(off)  # off is a byte offset
                buf = f.read()
                # parse only COMPLETE lines: a reader racing a
                # concurrent appender (build groups append from
                # threads) can see a partially-flushed trailing line —
                # leave it for the next load() instead of failing
                # json.loads on half a row
                cut = buf.rfind(b"\n") + 1
                buf = buf[:cut]
                new = [json.loads(line)
                       for line in buf.decode("utf-8").splitlines()
                       if line.strip()]
                rows = rows + new
                for r in new:  # incremental indexes: O(new rows) only
                    _index_row(idx, r)
                off += len(buf)
                _LINEAGE_CACHE[self.path] = (
                    (st.st_ino, st.st_dev, head), off, rows, idx)
        return rows, idx

    def load(self) -> list[dict]:
        return list(self._load()[0])  # callers must not alias the cache

    def done_partitions(self, build_id: str) -> set[str]:
        return set(self._load()[1]["done"].get(build_id, ()))

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

    def summary(self) -> dict:
        """Collapse lineage rows into the reference's site-status shape
        (SiteEntity status/statusTime/lastError, C3/C4;
        StatisticsServiceImpl.java:43-86): the LATEST row per
        (build_id, partition_id) wins (a successful retry clears an
        earlier FAILED); any terminal FAILED → FAILED + lastError, else
        any still-RUNNING partition → INDEXING, else INDEXED. Driver-
        side file read — no Spark jobs."""
        idx = self._load()[1]
        last = idx["last"]  # latest status row per (build, partition),
        # maintained in append order by _index_row (NOTE rows excluded
        # from the lifecycle — but they DO advance max_ts, so a
        # notes-only lineage still reports its last-activity time)
        if not last:
            return {"status": "INDEXED",
                    "status_time": idx["max_ts"] or None,
                    "last_error": None}
        failed = [r for r in last.values() if r["status"] == "FAILED"]
        running = [r for r in last.values() if r["status"] == "RUNNING"]
        if failed:
            worst = max(failed, key=lambda r: r.get("finished_at") or 0)
            status, err = "FAILED", worst.get("error")
        elif running:
            status, err = "INDEXING", None
        else:
            status, err = "INDEXED", None
        return {"status": status, "status_time": idx["max_ts"] or None,
                "last_error": err}

    def note(self, build_id: str, partition_id: str, **data) -> None:
        """Append an informational row carrying recovery data for a
        crash replay of the same build_id (status NOTE — invisible to
        done_partitions). Used by the incremental mutations to pin the
        PRE-mutation doc state: a replay whose docs/ step already
        committed can no longer recompute the original old_dl /
        old_existed from the (overwritten) store, so the meta deltas
        come from the note instead of drifting to zero."""
        self._append({"build_id": build_id, "partition_id": partition_id,
                      "status": "NOTE", "started_at": time.time(),
                      "data": data})

    def get_note(self, build_id: str, partition_id: str) -> dict | None:
        """Latest NOTE data for (build_id, partition_id), else None."""
        return self._load()[1]["note"].get((build_id, partition_id))

    def failed(self, build_id: str, partition_id: str, started_at: float,
               error: str) -> None:
        # mirrors the reference's FAILED(lastError) status
        # (IndexingServiceImpl.java:264-284)
        self._append({"build_id": build_id, "partition_id": partition_id,
                      "status": "FAILED", "started_at": started_at,
                      "finished_at": time.time(), "error": error[:2000]})
